from future_urban_scene_generation_tpu.geometry import rotations  # noqa: F401
from future_urban_scene_generation_tpu.geometry import projection  # noqa: F401
