"""Pallas TPU kernel for connected-component label propagation.

The XLA fallback (ops/blobs.py) runs each min-propagation sweep as a separate
HBM-resident while_loop iteration (pads, shifted slices, gathers).  This
kernel keeps the whole label grid in VMEM (a 256² int32 grid is 256 KB —
comfortably on-chip) and iterates to the fixpoint *inside* the kernel: one
kernel launch, zero HBM traffic between sweeps, early exit on convergence.

Each sweep propagates the min label along ENTIRE foreground runs — a
segmented min-scan over rows then columns (log2-depth shift/min ladders on
the VPU), plus one 8-neighbourhood min for diagonal links.  Convergence is
therefore O(#direction-changes of the longest geodesic path), NOT O(path
length): noisy percolation-style masks (blurred-absdiff thresholds from the
motion trackers) that need thousands of plain neighbour-min sweeps converge
in tens of composite sweeps (measured ~200x on tracker workloads — see
STATUS.md).

Semantics identical to ops/blobs._propagate: component id = min flat index.
Shapes must be (8k, 128m)-tileable; tracker masks are padded by callers
(ops/blobs._pad_tileable).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(connectivity: int, max_iters: int):
    def kernel(mask_ref, out_ref):
        h, w = mask_ref.shape
        big = jnp.int32(h * w)
        m = mask_ref[:] != 0
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        idx = rows * w + cols
        lab0 = jnp.where(m, idx, big)
        # hoisted edge masks: rolls wrap, so wrapped rows/cols are invalid
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

        def seg_min_scan(lab, axis: int):
            """min label over each pixel's contiguous foreground run along
            ``axis``: two log-depth segmented scans (forward + backward).

            Invariant of the segmented-scan ladder: mv[i] only ever
            aggregates values from i's own run, because mv[i-k] itself never
            crossed a run boundary — so boundaries never leak."""
            n = h if axis == 0 else w
            coord = rows if axis == 0 else cols

            def ladder(backward: bool):
                # c is int32 0/1, not bool — Mosaic can't rotate i1 vectors
                mv, c = lab, m.astype(jnp.int32)
                k = 1
                while k < n:
                    # forward: need x[i-k] at i  -> roll by +k
                    # backward: need x[i+k] at i -> roll by n-k (== -k)
                    if backward:
                        edge = coord >= n - k      # wrapped region after roll
                        sh = n - k
                    else:
                        edge = coord < k
                        sh = k
                    mv_s = jnp.where(edge, big, pltpu.roll(mv, shift=sh, axis=axis))
                    c_s = jnp.where(edge, 0, pltpu.roll(c, shift=sh, axis=axis))
                    mv = jnp.where(c == 1, jnp.minimum(mv, mv_s), mv)
                    c = c * c_s
                    k *= 2
                return mv

            return jnp.minimum(ladder(False), ladder(True))

        if connectivity == 8:
            def nb_min(lab):
                # separable 3x3 min: 4 rolls instead of 8
                cmin = jnp.minimum(lab, jnp.minimum(lft(lab), rgt(lab)))
                return jnp.minimum(cmin, jnp.minimum(up(cmin), down(cmin)))
        else:
            def nb_min(lab):
                return jnp.minimum(
                    jnp.minimum(lab, jnp.minimum(lft(lab), rgt(lab))),
                    jnp.minimum(up(lab), down(lab)))

        def sweep(lab):
            lab = jnp.where(m, seg_min_scan(lab, axis=1), big)
            lab = jnp.where(m, seg_min_scan(lab, axis=0), big)
            return jnp.where(m, nb_min(lab), big)

        def cond(c):
            i, _, changed = c
            return jnp.logical_and(changed, i < max_iters)

        def body(c):
            i, lab, _ = c
            new = sweep(lab)
            return i + 1, new, jnp.any(new != lab)

        _, lab, _ = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), lab0, jnp.bool_(True)))
        out_ref[:] = lab

    return kernel


def _make_batch_kernel(b: int, h: int, w: int, connectivity: int,
                       max_iters: int, with_init: bool = False):
    """Min-propagation to fixpoint for a (B, H, W) block of independent
    masks, processed as one (B·H, W) VMEM-resident grid with walls at frame
    boundaries.

    Without ``with_init`` this is connected-components labelling (each
    foreground pixel starts at its frame-local flat index; fixpoint = min
    index of its component).  With ``with_init`` the kernel takes a second
    (B, H, W) int32 operand and propagates the min of those values over each
    region component instead — the "component broadcast" primitive: seed the
    one root pixel of a component with a value (everything else = H*W) and
    every pixel of the component converges to it.  Distinct components are
    never 4-/8-adjacent within their own region mask, so values cannot leak.

    Batching matters twice on TPU: ops on a single small mask (a tracker crop
    is ~17 sublane tiles) are instruction-overhead-bound, and a serial
    grid/vmap pays SUM of per-frame convergence sweeps — the merged grid runs
    B frames per VPU op and converges in the MAX of their sweep counts."""

    def kernel(mask_ref, *rest):
        if with_init:
            init_ref, out_ref = rest
        else:
            (out_ref,) = rest
        big = jnp.int32(h * w)
        # per-frame row index / labels built in 3-D (no integer mod needed)
        rmod3 = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
        rmod = rmod3.reshape(b * h, w)
        cols = jax.lax.broadcasted_iota(jnp.int32, (b * h, w), 1)
        m = mask_ref[...].reshape(b * h, w) != 0
        if with_init:
            lab0 = jnp.where(m, init_ref[...].reshape(b * h, w), big)
        else:
            lab0 = jnp.where(m, rmod * w + cols, big)
        top, bot = rmod == 0, rmod == h - 1          # frame-local walls
        left, right = cols == 0, cols == w - 1
        n_rows = b * h

        def up(x):
            return jnp.where(bot, big, pltpu.roll(x, shift=n_rows - 1, axis=0))

        def down(x):
            return jnp.where(top, big, pltpu.roll(x, shift=1, axis=0))

        def lft(x):
            return jnp.where(right, big, pltpu.roll(x, shift=w - 1, axis=1))

        def rgt(x):
            return jnp.where(left, big, pltpu.roll(x, shift=1, axis=1))

        def seg_min_scan(lab, axis: int):
            n = h if axis == 0 else w
            size = n_rows if axis == 0 else w
            coord = rmod if axis == 0 else cols

            def ladder(backward: bool):
                mv, c = lab, m.astype(jnp.int32)
                k = 1
                while k < n:
                    # frame-local edges: a roll across a frame boundary lands
                    # on rows whose coord-within-frame < k (resp. >= n-k),
                    # exactly the rows the edge mask invalidates
                    if backward:
                        edge = coord >= n - k
                        sh = size - k
                    else:
                        edge = coord < k
                        sh = k
                    mv_s = jnp.where(edge, big,
                                     pltpu.roll(mv, shift=sh, axis=axis))
                    c_s = jnp.where(edge, 0, pltpu.roll(c, shift=sh, axis=axis))
                    mv = jnp.where(c == 1, jnp.minimum(mv, mv_s), mv)
                    c = c * c_s
                    k *= 2
                return mv

            return jnp.minimum(ladder(False), ladder(True))

        if connectivity == 8:
            def nb_min(lab):
                cmin = jnp.minimum(lab, jnp.minimum(lft(lab), rgt(lab)))
                return jnp.minimum(cmin, jnp.minimum(up(cmin), down(cmin)))
        else:
            def nb_min(lab):
                return jnp.minimum(
                    jnp.minimum(lab, jnp.minimum(lft(lab), rgt(lab))),
                    jnp.minimum(up(lab), down(lab)))

        def sweep(lab):
            lab = jnp.where(m, seg_min_scan(lab, axis=1), big)
            lab = jnp.where(m, seg_min_scan(lab, axis=0), big)
            return jnp.where(m, nb_min(lab), big)

        def cond(c):
            i, _, changed = c
            return jnp.logical_and(changed, i < max_iters)

        def body(c):
            i, lab, _ = c
            new = sweep(lab)
            return i + 1, new, jnp.any(new != lab)

        _, lab, _ = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), lab0, jnp.bool_(True)))
        out_ref[...] = lab.reshape(b, h, w)

    return kernel


def _make_dual_batch_kernel(b: int, h: int, w: int, max_iters: int,
                            with_init: bool = False):
    """Min-propagation fixpoint over TWO DISJOINT regions in one kernel.

    ``code`` (B, H, W) int32 marks each pixel's region: 1 propagates
    8-connected, 2 propagates 4-connected, 0 is inactive.  Because the
    regions are disjoint (here: tracker mask vs its background), one label
    grid holds both propagations and one convergence loop drives them —
    replacing two kernel launches (and the SUM of their sweep counts) with
    one launch converging in the MAX.  Values never cross regions:

      * the segmented-scan ladder extends a run only while the region code
        is unchanged, and masks the partner aggregate to ``big`` unless the
        source pixel's code matches (the binary kernel relied on background
        labels being ``big``; with two live regions the content check is
        load-bearing);
      * neighbour mins read each region through its own ``where(code==r)``
        view, diagonals only through the 8-connected one.

    Semantics are pinned equal to running the two single-region kernels
    (tests/test_blobs_pallas.py).
    """

    def kernel(code_ref, *rest):
        if with_init:
            init_ref, out_ref = rest
        else:
            (out_ref,) = rest
        big = jnp.int32(h * w)
        rmod = jax.lax.broadcasted_iota(
            jnp.int32, (b, h, w), 1).reshape(b * h, w)
        cols = jax.lax.broadcasted_iota(jnp.int32, (b * h, w), 1)
        code = code_ref[...].reshape(b * h, w)
        active = code != 0
        if with_init:
            lab0 = jnp.where(active, init_ref[...].reshape(b * h, w), big)
        else:
            lab0 = jnp.where(active, rmod * w + cols, big)
        top, bot = rmod == 0, rmod == h - 1          # frame-local walls
        left, right = cols == 0, cols == w - 1
        n_rows = b * h

        def up(x, fill):
            return jnp.where(bot, fill, pltpu.roll(x, shift=n_rows - 1, axis=0))

        def down(x, fill):
            return jnp.where(top, fill, pltpu.roll(x, shift=1, axis=0))

        def lft(x, fill):
            return jnp.where(right, fill, pltpu.roll(x, shift=w - 1, axis=1))

        def rgt(x, fill):
            return jnp.where(left, fill, pltpu.roll(x, shift=1, axis=1))

        def seg_min_scan(lab, axis: int):
            n = h if axis == 0 else w
            size = n_rows if axis == 0 else w
            coord = rmod if axis == 0 else cols

            def ladder(backward: bool):
                # c = region code of the window (i-k, i] when uniform, else 0
                mv, c = lab, jnp.where(active, code, 0)
                k = 1
                while k < n:
                    if backward:
                        edge = coord >= n - k
                        sh = size - k
                    else:
                        edge = coord < k
                        sh = k
                    mv_s = jnp.where(edge, big,
                                     pltpu.roll(mv, shift=sh, axis=axis))
                    c_s = jnp.where(edge, 0,
                                    pltpu.roll(c, shift=sh, axis=axis))
                    code_s = jnp.where(edge, 0,
                                       pltpu.roll(code, shift=sh, axis=axis))
                    # content check: mv[i-k] aggregates i-k's own region, so
                    # only fold it in when i-k shares my code
                    mv_s = jnp.where(code_s == code, mv_s, big)
                    mv = jnp.where(c != 0, jnp.minimum(mv, mv_s), mv)
                    c = jnp.where((c != 0) & (c_s == c), c, 0)
                    k *= 2
                return mv

            return jnp.minimum(ladder(False), ladder(True))

        is8 = code == 1
        is4 = code == 2

        def nb_min(lab):
            lab8 = jnp.where(is8, lab, big)
            lab4 = jnp.where(is4, lab, big)
            # 8-conn region: separable 3x3 min over its own view
            cmin = jnp.minimum(lab8, jnp.minimum(lft(lab8, big),
                                                 rgt(lab8, big)))
            nb8 = jnp.minimum(cmin, jnp.minimum(up(cmin, big),
                                                down(cmin, big)))
            # 4-conn region: plus-shaped min over its own view
            nb4 = jnp.minimum(
                jnp.minimum(lab4, jnp.minimum(lft(lab4, big), rgt(lab4, big))),
                jnp.minimum(up(lab4, big), down(lab4, big)))
            return jnp.where(is8, nb8, jnp.where(is4, nb4, big))

        def sweep(lab):
            lab = jnp.where(active, seg_min_scan(lab, axis=1), big)
            lab = jnp.where(active, seg_min_scan(lab, axis=0), big)
            return nb_min(lab)

        def cond(c):
            i, _, changed = c
            return jnp.logical_and(changed, i < max_iters)

        def body(c):
            i, lab, _ = c
            new = sweep(lab)
            return i + 1, new, jnp.any(new != lab)

        _, lab, _ = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), lab0, jnp.bool_(True)))
        out_ref[...] = lab.reshape(b, h, w)

    return kernel


@partial(jax.jit, static_argnums=(1,))
def dual_cc_pallas_batch(code, max_iters: int = 65536):
    """Per-frame CC labels for two disjoint regions in ONE fixpoint kernel.

    code: (T, H, W) int32 — 1: 8-connected region, 2: 4-connected region,
    0: inactive.  Returns (T, H, W) int32 labels (frame-local min flat index
    per component; inactive = H*W).  Equal to running
    :func:`connected_components_pallas_batch` per region.
    """
    t, h, w = code.shape
    max_iters = min(max_iters, h * w // 2 + 2)
    b = _group_size(t, h, w)
    spec = pl.BlockSpec((b, h, w), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_dual_batch_kernel(b, h, w, max_iters),
        grid=(t // b,),
        out_shape=jax.ShapeDtypeStruct((t, h, w), jnp.int32),
        in_specs=[spec],
        out_specs=spec,
    )(code.astype(jnp.int32))


@partial(jax.jit, static_argnums=(2,))
def dual_min_prop_pallas_batch(code, init, max_iters: int = 65536):
    """Component broadcast over two disjoint regions in ONE fixpoint kernel:
    every pixel converges to the MIN of ``init`` over its component, where
    code-1 components are 8-connected and code-2 components 4-connected.
    Equal to running :func:`min_prop_pallas_batch` per region."""
    t, h, w = code.shape
    max_iters = min(max_iters, h * w // 2 + 2)
    b = _group_size(t, h, w)
    spec = pl.BlockSpec((b, h, w), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_dual_batch_kernel(b, h, w, max_iters, with_init=True),
        grid=(t // b,),
        out_shape=jax.ShapeDtypeStruct((t, h, w), jnp.int32),
        in_specs=[spec, spec],
        out_specs=spec,
    )(code.astype(jnp.int32), init.astype(jnp.int32))


def _group_size(t: int, h: int, w: int) -> int:
    """Frames per VMEM block.  The sweep keeps ~2.3 MB live per frame at its
    peak (measured from the compiler's scoped-vmem accounting: ladder temps +
    while carry + double-buffered grid DMA), so ~768 KB of labels per group
    keeps the total under the 16 MB VMEM budget with headroom."""
    b = max(1, (3 << 18) // (h * w * 4))
    while t % b:
        b -= 1
    return b


@partial(jax.jit, static_argnums=(1, 2))
def connected_components_pallas_batch(masks, connectivity: int = 8,
                                      max_iters: int = 65536):
    """Per-frame CC labels for (T, H, W) boolean masks on TPU — one kernel,
    grid over frame groups (DMA of group g+1 overlaps compute of group g).

    H must be a multiple of 8 and W a multiple of 128.  Labels use the
    within-frame flat index; background = H*W.
    """
    t, h, w = masks.shape
    max_iters = min(max_iters, h * w // 2 + 2)
    b = _group_size(t, h, w)
    return pl.pallas_call(
        _make_batch_kernel(b, h, w, connectivity, max_iters),
        grid=(t // b,),
        out_shape=jax.ShapeDtypeStruct((t, h, w), jnp.int32),
        in_specs=[pl.BlockSpec((b, h, w), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, h, w), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )(masks.astype(jnp.int32))


@partial(jax.jit, static_argnums=(2, 3))
def min_prop_pallas_batch(region, init, connectivity: int = 8,
                          max_iters: int = 65536):
    """Per-frame component broadcast on TPU: for every component of
    ``region`` (T, H, W) bool, every pixel converges to the MIN of ``init``
    (int32) over that component; pixels outside region = H*W.

    With init = per-frame flat index this is exactly CC; with init = a value
    seeded at each component's root pixel (H*W elsewhere) it broadcasts the
    root's value over the component — the primitive behind the gather-free
    top-n blob selection (ops/blobs._select_fields_batch).
    """
    t, h, w = region.shape
    max_iters = min(max_iters, h * w // 2 + 2)
    b = _group_size(t, h, w)
    spec = pl.BlockSpec((b, h, w), lambda g: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_batch_kernel(b, h, w, connectivity, max_iters, with_init=True),
        grid=(t // b,),
        out_shape=jax.ShapeDtypeStruct((t, h, w), jnp.int32),
        in_specs=[spec, spec],
        out_specs=spec,
    )(region.astype(jnp.int32), init.astype(jnp.int32))


@partial(jax.jit, static_argnums=(1, 2))
def connected_components_pallas(mask, connectivity: int = 8,
                                max_iters: int = 65536):
    """VMEM-resident CC labels for a (H, W) boolean mask on TPU.

    H must be a multiple of 8 and W a multiple of 128 (TPU tiling).
    ``max_iters`` counts composite sweeps (full row+col run propagation each);
    every sweep advances along at least one full run + one link of the
    longest geodesic path, so HW/2 sweeps always suffice (the loop exits on
    convergence long before that for any non-adversarial mask).
    """
    h, w = mask.shape
    max_iters = min(max_iters, h * w // 2 + 2)
    return pl.pallas_call(
        _make_kernel(connectivity, max_iters),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(mask.astype(jnp.int32))
