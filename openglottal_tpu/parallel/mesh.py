"""Device mesh and sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.4); scaling here
is native JAX SPMD: a Mesh with axes

  * ``data``  — batch/frame axis.  Video inference shards the *frame chunk*
    axis (the TPU analog of sequence parallelism: YOLO/U-Net passes are
    stateless per frame; the tiny gate/EMA recurrences consume per-frame
    summaries afterwards).  Training shards the image batch.
  * ``model`` — reserved tensor-parallel axis.  The 7.76M-param U-Net never
    needs it, but the framework exposes it so configs can request TP without
    code changes (conv channels shard via the same NamedSharding paths).

Collectives (grad psum, carry handoff) are inserted by XLA from sharding
annotations — no hand-written communication layer, riding ICI by construction.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over ``devices`` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, x):
    """Shard the leading axis of every array in ``x`` over the data axis."""
    def put(a):
        spec = P("data", *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree.map(put, x)


def replicate(mesh: Mesh, x):
    """Fully replicate a pytree (model params) over the mesh."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P()))
    return jax.tree.map(put, x)


def batch_spec(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_model_params(mesh: Mesh, variables):
    """Tensor-parallel parameter placement: every array whose trailing
    (out-channel) dim divides the ``model`` axis shards that dim over it
    (Megatron-style column split — conv kernels (H, W, I, O), biases and
    folded-BN scale/shift all carry channels last); everything else
    replicates.  XLA GSPMD propagates the placement through the network and
    inserts the collectives (all-gathers at channel-joining ops like the
    U-Net skip concats, psums where a contraction crosses the split) — no
    hand-written communication, riding ICI by construction.

    The 7.76M-param U-Net does not NEED tensor parallelism (SURVEY §2.4);
    this makes the ``model`` axis a real, exercised path (1-vs-sharded
    equality pinned in tests/test_mesh.py) so larger models can request it
    via config (config.mesh.n_model) without code changes."""
    n = mesh.shape["model"]

    def put(a):
        if n > 1 and a.ndim >= 1 and a.shape[-1] % n == 0 \
                and a.shape[-1] >= 2 * n:
            spec = P(*([None] * (a.ndim - 1)), "model")
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, variables)


def pad_to_multiple(x, m: int, axis: int = 0):
    """Pad an axis to a multiple of ``m`` (sharding needs divisibility)."""
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(x), widths), n
