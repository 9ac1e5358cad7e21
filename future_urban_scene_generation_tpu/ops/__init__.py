from future_urban_scene_generation_tpu.ops import colorspace  # noqa: F401
from future_urban_scene_generation_tpu.ops import resize  # noqa: F401
from future_urban_scene_generation_tpu.ops import polygon  # noqa: F401
