from future_urban_scene_generation_tpu.models import layers  # noqa: F401
