from openglottal_tpu.data.video import load_frames_bgr, bgr_to_gray_u8  # noqa: F401

# reference openglottal/data.py surface (data.py:28-329) under the same
# names, so ``from openglottal_tpu.data import mask_to_yolo, ...`` works —
# lazy to keep bare imports light (cv2/h5py load on use)
_REF_NAMES = {
    "mask_to_yolo": ("openglottal_tpu.data.yolo_dataset", "mask_to_yolo"),
    "build_yolo_dataset": ("openglottal_tpu.data.yolo_dataset",
                           "build_yolo_dataset"),
    "build_glottis_hdf5": ("openglottal_tpu.data.dataset",
                           "build_glottis_hdf5"),
    "load_glottis_hdf5": ("openglottal_tpu.data.dataset",
                          "load_glottis_hdf5"),
    "resolve_kaggle_data_paths": ("openglottal_tpu.data.kaggle_paths",
                                  "resolve_kaggle_data_paths"),
    "GlottisDataset": ("openglottal_tpu.compat", "GlottisDataset"),
    "GlottisDatasetHDF5": ("openglottal_tpu.compat", "GlottisDatasetHDF5"),
}


def __getattr__(name):
    if name in _REF_NAMES:
        import importlib

        mod, attr = _REF_NAMES[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
