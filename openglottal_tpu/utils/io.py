"""Weight path resolution and checkpoint loading.

Mirrors the reference's tolerant loading surface: ``resolve_weights_path``
falls back to ``weights/<name>`` (utils.py:16-24), and U-Net weights load
from either our orbax checkpoints or reference-style torch ``.pt`` files
({model|state_dict|raw} dicts accepted, train_unet.py:149).
"""

from __future__ import annotations

from pathlib import Path


def resolve_weights_path(path) -> Path:
    """Return path if it exists; else try weights/<basename> (utils.py:16-24)."""
    p = Path(path)
    if p.exists():
        return p
    legacy = Path("weights") / p.name
    if legacy.exists():
        return legacy
    return p


def save_weights_npz(variables, path) -> None:
    """Save a {params, batch_stats} variable tree as one ``.npz`` file
    (keys = '/'-joined tree paths) — a single-file, framework-neutral
    checkpoint for small in-repo weights (weights/demo_*.npz)."""
    import numpy as np

    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", variables)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_weights_npz(path):
    """Inverse of :func:`save_weights_npz`: '/'-joined keys -> nested dict."""
    import numpy as np

    tree: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = tree
            parts = key.split("/")
            for k in parts[:-1]:
                node = node.setdefault(k, {})
            node[parts[-1]] = z[key]
    return tree


def load_unet_weights(path):
    """Load U-Net variables from an orbax ckpt dir, an ``.npz`` saved by
    :func:`save_weights_npz`, or a torch .pt file."""
    p = resolve_weights_path(path)
    if not p.exists():
        raise FileNotFoundError(
            f"U-Net weights not found: {path} (also tried weights/{p.name}). "
            "Expected an orbax checkpoint directory (outputs/unet/best), a "
            ".npz weight file, or a torch .pt state_dict.")
    if p.is_dir():
        import orbax.checkpoint as ocp

        tree = ocp.StandardCheckpointer().restore(p.resolve())
        return {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    if p.suffix == ".npz":
        return load_weights_npz(p)
    from openglottal_tpu.utils.torch_import import unet_from_torch

    return unet_from_torch(p)


def load_yolo_weights(path):
    """Load YOLO variables from an orbax ckpt dir or an ultralytics-style
    torch ``.pt`` (parsed without the ultralytics package — the checkpoint's
    DetectionModel pickle is unpickled with stub classes and its tensors
    remapped; utils/yolo_import.py)."""
    p = resolve_weights_path(path)
    if not Path(p).exists():
        raise FileNotFoundError(
            f"YOLO weights not found: {path} (also tried weights/{Path(p).name}). "
            "Expected an orbax checkpoint directory (outputs/yolo/best) or an "
            "ultralytics YOLOv8n .pt checkpoint.")
    if Path(p).is_dir():
        import orbax.checkpoint as ocp

        tree = ocp.StandardCheckpointer().restore(Path(p).resolve())
        return {"params": tree["params"], "batch_stats": tree["batch_stats"]}
    if Path(p).suffix == ".npz":
        return load_weights_npz(p)
    from openglottal_tpu.utils.yolo_import import yolo_from_torch

    return yolo_from_torch(p)


def save_features_json(feats: dict, out_path) -> None:
    """features.json with array-to-list conversion (reference cli.py:94-99)."""
    import json
    import os

    out_path = Path(out_path)
    os.makedirs(out_path.parent, exist_ok=True)
    save = {k: (v.tolist() if hasattr(v, "tolist") else v) for k, v in feats.items()}
    with open(out_path, "w") as f:
        json.dump(save, f, indent=2)
