from openglottal_tpu.data.video import load_frames_bgr, bgr_to_gray_u8  # noqa: F401
