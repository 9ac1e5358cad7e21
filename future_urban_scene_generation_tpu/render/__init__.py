from future_urban_scene_generation_tpu.render import rasterizer  # noqa: F401
from future_urban_scene_generation_tpu.render import visibility  # noqa: F401
from future_urban_scene_generation_tpu.render import planes  # noqa: F401
