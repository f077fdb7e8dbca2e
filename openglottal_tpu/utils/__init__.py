from openglottal_tpu.utils.io import resolve_weights_path, load_unet_weights  # noqa: F401
