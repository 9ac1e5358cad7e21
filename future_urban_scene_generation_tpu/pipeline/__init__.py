from future_urban_scene_generation_tpu.pipeline import stages  # noqa: F401
