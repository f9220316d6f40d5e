from endosurf_tpu.data.scene_data import SceneData  # noqa: F401
