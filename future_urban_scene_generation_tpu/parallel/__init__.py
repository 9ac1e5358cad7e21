from future_urban_scene_generation_tpu.parallel import mesh  # noqa: F401
