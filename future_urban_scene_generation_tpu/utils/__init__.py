from future_urban_scene_generation_tpu.utils import bbox  # noqa: F401
from future_urban_scene_generation_tpu.utils import keypoints  # noqa: F401
