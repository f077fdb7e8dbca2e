"""Pallas TPU kernel for connected-component label propagation.

The XLA fallback (ops/blobs.py) runs each min-propagation sweep as a separate
HBM-resident while_loop iteration (pads, shifted slices, gathers).  This
kernel keeps the whole label grid in VMEM (a 256² int32 grid is 256 KB —
comfortably on-chip) and iterates to the fixpoint *inside* the kernel: one
kernel launch, zero HBM traffic between sweeps, early exit on convergence.

Semantics identical to ops/blobs._propagate without pointer jumping:
component id = min flat index; convergence is O(geodesic diameter) sweeps,
each a handful of VPU ops on VMEM — microseconds per sweep.  Shapes must be
(8k, 128m)-tileable; the tracker masks (256², crop sizes padded by callers)
satisfy this.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(x, dy: int, dx: int, fill):
    """Shift a 2-D VMEM-resident array, filling vacated cells.
    pltpu.roll requires non-negative shifts: negative shifts wrap around."""
    h, w = x.shape
    out = x
    if dy:
        out = pltpu.roll(out, shift=dy % h, axis=0)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        if dy > 0:
            out = jnp.where(row_ids < dy, fill, out)
        else:
            out = jnp.where(row_ids >= h + dy, fill, out)
    if dx:
        out = pltpu.roll(out, shift=dx % w, axis=1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        if dx > 0:
            out = jnp.where(col_ids < dx, fill, out)
        else:
            out = jnp.where(col_ids >= w + dx, fill, out)
    return out


STEPS_PER_CHECK = 8  # propagation sweeps between convergence checks


def _make_kernel(connectivity: int, max_iters: int):
    def kernel(mask_ref, out_ref):
        h, w = mask_ref.shape
        big = jnp.int32(h * w)
        m = mask_ref[:] != 0
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        idx = rows * w + cols
        lab0 = jnp.where(m, idx, big)
        # hoisted edge masks: rolls wrap, so the wrapped row/col is invalid
        top, bot = rows == 0, rows == h - 1
        left, right = cols == 0, cols == w - 1

        def up(x):
            return jnp.where(bot, big, pltpu.roll(x, shift=h - 1, axis=0))

        def down(x):
            return jnp.where(top, big, pltpu.roll(x, shift=1, axis=0))

        def lft(x):
            return jnp.where(right, big, pltpu.roll(x, shift=w - 1, axis=1))

        def rgt(x):
            return jnp.where(left, big, pltpu.roll(x, shift=1, axis=1))

        if connectivity == 8:
            def sweep(lab):
                # separable 3x3 min: 4 rolls instead of 8
                cmin = jnp.minimum(lab, jnp.minimum(lft(lab), rgt(lab)))
                nb = jnp.minimum(cmin, jnp.minimum(up(cmin), down(cmin)))
                return jnp.where(m, nb, big)
        else:
            def sweep(lab):
                nb = jnp.minimum(jnp.minimum(lab, jnp.minimum(lft(lab), rgt(lab))),
                                 jnp.minimum(up(lab), down(lab)))
                return jnp.where(m, nb, big)

        def cond(c):
            i, _, changed = c
            return jnp.logical_and(changed, i < max_iters)

        def body(c):
            i, lab, _ = c
            new = lab
            for _ in range(STEPS_PER_CHECK):
                new = sweep(new)
            return i + STEPS_PER_CHECK, new, jnp.any(new != lab)

        _, lab, _ = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), lab0, jnp.bool_(True)))
        out_ref[:] = lab

    return kernel


@partial(jax.jit, static_argnums=(1, 2))
def connected_components_pallas(mask, connectivity: int = 8,
                                max_iters: int = 65536):
    """VMEM-resident CC labels for a (H, W) boolean mask on TPU.

    H must be a multiple of 8 and W a multiple of 128 (TPU tiling).
    """
    h, w = mask.shape
    return pl.pallas_call(
        _make_kernel(connectivity, max_iters),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mask.astype(jnp.int32))
