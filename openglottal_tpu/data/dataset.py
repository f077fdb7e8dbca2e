"""Dataset materialisation: PNG frames + masks -> packed uint8 arrays.

Replaces the reference's per-item cv2 loading (GlottisDataset,
openglottal/models/unet.py:91-148, and the HDF5 cache, data.py:200-329) with
one-shot host materialisation into memory-mappable .npz shards: images are
letterboxed to 256² exactly as the reference does (INTER_NEAREST for 2-D
arrays, masks with the same geometry), then the whole epoch pipeline is
device-side (data/augment.py).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import numpy as np

SIZE = 256


def _letterbox_pair(img, msk):
    import cv2

    from openglottal_tpu.ops.resize import letterbox_info

    h, w = img.shape[:2]
    if (h, w) == (SIZE, SIZE):
        return img, msk
    pt, pl, ch, cw = letterbox_info(h, w, SIZE)
    out_i = np.zeros((SIZE, SIZE), img.dtype)
    out_m = np.zeros((SIZE, SIZE), msk.dtype)
    out_i[pt:pt + ch, pl:pl + cw] = cv2.resize(img, (cw, ch), interpolation=cv2.INTER_NEAREST)
    out_m[pt:pt + ch, pl:pl + cw] = cv2.resize(msk, (cw, ch), interpolation=cv2.INTER_NEAREST)
    return out_i, out_m


def materialize_split(
    fnames: list[str],
    img_dir,
    lbl_dir,
    label_suffix: str = "",
    cache_dir=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Load (images (N,256,256) u8, masks (N,256,256) u8 in {0,1}).

    ``label_suffix`` mirrors the reference ("_seg" for BAGLS,
    unet.py:107,134).  With ``cache_dir`` set, results are cached keyed by
    the sha256 of the file list + dirs (like train_unet_crop.py:54-70).
    """
    import cv2

    img_dir, lbl_dir = Path(img_dir), Path(lbl_dir)
    if cache_dir is not None:
        key = hashlib.sha256(
            json.dumps([sorted(fnames), str(img_dir), str(lbl_dir), label_suffix]).encode()
        ).hexdigest()[:16]
        cache = Path(cache_dir) / f"glottis_{key}.npz"
        if cache.exists():
            z = np.load(cache)
            return z["images"], z["masks"]

    n = len(fnames)
    images = np.zeros((n, SIZE, SIZE), np.uint8)
    masks = np.zeros((n, SIZE, SIZE), np.uint8)
    for i, fname in enumerate(fnames):
        stem = Path(fname).stem
        lbl = f"{stem}{label_suffix}.png" if label_suffix else fname
        img = cv2.imread(str(img_dir / fname), cv2.IMREAD_GRAYSCALE)
        msk = cv2.imread(str(lbl_dir / lbl), cv2.IMREAD_GRAYSCALE)
        if img is None or msk is None:
            raise FileNotFoundError(f"missing image or mask: {fname} / {lbl}")
        img, msk = _letterbox_pair(img, msk)
        images[i] = img
        masks[i] = (msk > 0).astype(np.uint8)

    if cache_dir is not None:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        np.savez_compressed(cache, images=images, masks=masks)
    return images, masks


def load_split_json(path) -> dict:
    """training.json with keys ``training`` / ``Val`` / optional ``test``
    (reference data.py:120-125)."""
    with open(path) as f:
        return json.load(f)


# ── HDF5 cache (reference data.py:200-329 format compatibility) ──────────────


def build_glottis_hdf5(fnames, img_dir, lbl_dir, output_path,
                       label_suffix: str = "", size: int = 256):
    """Write letterboxed images and {0,1} masks to HDF5 with the reference's
    exact layout (datasets ``images``/``masks``/``fnames``, data.py:200-259)
    so caches interchange with the reference toolchain."""
    import h5py

    from pathlib import Path as _P

    images, masks = materialize_split(fnames, img_dir, lbl_dir, label_suffix)
    output_path = _P(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    n = len(fnames)
    with h5py.File(output_path, "w") as f:
        f.create_dataset("images", data=images, dtype="u1",
                         chunks=(1, size, size))
        f.create_dataset("masks", data=masks, dtype="u1",
                         chunks=(1, size, size))
        ds = f.create_dataset("fnames", (n,), dtype=h5py.special_dtype(vlen=str))
        for i, fname in enumerate(fnames):
            ds[i] = fname
    return output_path


def load_glottis_hdf5(h5_path) -> tuple[np.ndarray, np.ndarray]:
    """Load a reference-format HDF5 cache into packed arrays (the TPU
    trainer wants whole-split arrays, not per-item reads)."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        return f["images"][:], f["masks"][:]
