"""On-device connected components and N-largest-blob filtering.

The reference filters tracker masks to the N largest connected components via
``cv2.findContours`` + ``cv2.drawContours(..., FILLED)``
(openglottal/models/tracker.py:57-77,167-179).  That is an irregular,
host-side op; here it is a static-shape, jittable label-propagation kernel:

  1. every foreground pixel starts labelled with its own flat index;
  2. iterate: take the min label over the 8-neighbourhood, then compress
     label chains by pointer jumping (lab = lab[lab]);
  3. component id = min flat index in the component.

Pointer jumping makes convergence effectively logarithmic in blob diameter;
the propagation runs to an exact fixpoint under ``lax.while_loop`` (early
exit — typical masks converge in <10 sweeps; validated against cv2 in tests,
including worst-case spirals and 1-px serpentine channels).

Semantics: the reference's ``findContours(RETR_EXTERNAL)`` +
``drawContours(FILLED)`` combo is reproduced *topologically* — a component's
filled region is everything separated from the image border by that component
alone (its closed holes, plus components nested inside them), ranked by
foreground pixel count.  Two documented divergences from cv2, both irrelevant
to glottal masks and pinned by tests:
  * cv2 ranks blobs by polygon ``contourArea``, which can swap near-tied
    ragged blobs (polygon area ≈ pixels − perimeter/2);
  * cv2's fillPoly rasterization also paints bays whose only connection to
    the outside is a 1-px-wide channel (the contour walls pass through the
    flanking pixel centres, capturing the channel interior); topologically
    these are open and stay unpainted here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _neighbor_min(lab, big):
    """Min label over the 8-neighbourhood (pad with ``big``)."""
    p = jnp.pad(lab, 1, constant_values=big)
    h, w = lab.shape
    out = lab
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            out = jnp.minimum(out, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w)))
    return out


def _neighbor_min4(lab, big):
    """Min label over the 4-neighbourhood (for background/hole labelling)."""
    p = jnp.pad(lab, 1, constant_values=big)
    h, w = lab.shape
    out = lab
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        out = jnp.minimum(out, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w)))
    return out


def _propagate(mask, iters: int, connectivity: int):
    """Label propagation to fixpoint: each sweep takes the neighbourhood min
    then compresses pointer chains (lab = lab[lab]); a ``while_loop`` runs
    until no label changes (early exit — typical masks converge in < 10
    sweeps; ``iters`` only caps pathological inputs).

    On TPU with tileable shapes the VMEM-resident Pallas kernel
    (ops/blobs_pallas.py) runs instead — 2-3x faster (no HBM traffic between
    sweeps)."""
    h, w = mask.shape
    if h % 8 == 0 and w % 128 == 0 and jax.default_backend() == "tpu":
        from openglottal_tpu.ops.blobs_pallas import connected_components_pallas

        return connected_components_pallas(mask.astype(jnp.bool_),
                                           connectivity, max(iters, 64) * 8)
    big = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    lab0 = jnp.where(mask, idx, big)
    nb_min = _neighbor_min if connectivity == 8 else _neighbor_min4

    def sweep(lab):
        lab = jnp.where(mask, jnp.minimum(lab, nb_min(lab, big)), big)
        flat = lab.reshape(-1)
        lut = jnp.concatenate([flat, big[None]])
        for _ in range(3):  # pointer jumping: compress label chains
            flat = lut[flat]
            lut = jnp.concatenate([flat, big[None]])
        return flat.reshape(h, w)

    def cond(state):
        i, _, changed = state
        return changed & (i < iters)

    def body(state):
        i, lab, _ = state
        new = sweep(lab)
        return i + 1, new, jnp.any(new != lab)

    _, lab, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), lab0, jnp.bool_(True)))
    return lab


@partial(jax.jit, static_argnums=(1, 2))
def connected_components(mask, iters: int = 4096, connectivity: int = 8):
    """Label 8-connected components of a boolean (H, W) mask.

    Returns int32 labels: component id = min flat index in the component;
    background = H*W.
    """
    return _propagate(mask.astype(jnp.bool_), iters, connectivity)


def _pad_tileable(mask):
    """Pad a boolean mask so the Pallas CC kernel's (8, 128) tiling applies
    (padding is background touching the border — blob semantics unchanged).
    Returns (padded, (h, w)) with original dims for cropping back."""
    h, w = mask.shape
    ph = (-h) % 8
    pw = (-w) % 128
    if ph or pw:
        mask = jnp.pad(mask, ((0, ph), (0, pw)))
    return mask, (h, w)


@partial(jax.jit, static_argnums=(1,))
def fill_holes(mask, iters: int = 4096):
    """Fill interior holes: background 4-components not touching the border."""
    mask = mask.astype(jnp.bool_)
    h, w = mask.shape
    bg = ~mask
    lab = _propagate(bg, iters, connectivity=4)
    border_ids = jnp.concatenate(
        [lab[0, :], lab[-1, :], lab[:, 0], lab[:, -1]]
    )
    reach = jnp.zeros((h * w + 1,), jnp.bool_).at[border_ids].set(True)
    is_outside = reach[lab.reshape(-1)].reshape(h, w) & bg
    return mask | (bg & ~is_outside)


def _propagate_batch(masks, iters: int, connectivity: int):
    """Per-frame CC labels for a (T, H, W) stack.  On TPU with tileable
    shapes this is ONE Pallas call (frames grouped into shared VMEM blocks —
    fatter VPU ops, convergence = max over the group instead of the sum a
    serial vmap pays); elsewhere it vmaps the XLA propagation."""
    t, h, w = masks.shape
    if h % 8 == 0 and w % 128 == 0 and jax.default_backend() == "tpu":
        from openglottal_tpu.ops.blobs_pallas import (
            connected_components_pallas_batch,
        )

        return connected_components_pallas_batch(masks.astype(jnp.bool_),
                                                 connectivity,
                                                 max(iters, 64) * 8)
    return jax.vmap(lambda m: _propagate(m, iters, connectivity))(masks)


def _component_tree(mask, iters: int):
    """Nesting analysis of foreground 8-components and background 4-components.

    Exploits a property of the label-propagation CC: a component's id is the
    flat index of its topmost-leftmost pixel, and the pixel directly ABOVE
    that root pixel always belongs to the component's *enclosing* region (for
    a background comp: the enclosing foreground comp; for a foreground comp:
    the background comp it is embedded in).  That gives parent pointers
    without any contour tracing.

    Returns (labF, labB, rootF, hole) where
      labF: (H, W) i32 foreground labels (bg pixels -> HW)
      labB: (H, W) i32 background labels (fg pixels -> HW)
      rootF: (HW+1,) i32  absorb-root per foreground comp id (nested comps
             resolve to their top-level enclosing comp)
      hole: (HW+1,) bool  per background comp id — True iff cv2's FILLED draw
             of its enclosing contour would paint it (i.e. it is a hole of a
             single component, possibly containing nested comps; background
             "pockets" jointly enclosed by several comps stay False).
    """
    labF = _propagate(mask, iters, connectivity=8)
    labB = _propagate(~mask, iters, connectivity=4)
    return _component_tree_from_labels(mask, labF, labB)


def _component_tree_from_labels(mask, labF, labB):
    """Pure (gather/scatter) part of :func:`_component_tree`, given the two
    label maps — vmappable, so batch callers can compute labels with the
    batched Pallas kernel first."""
    h, w = mask.shape
    hw = h * w
    flatF = labF.reshape(-1)
    flatB = labB.reshape(-1)

    ids = jnp.arange(hw + 1, dtype=jnp.int32)
    up = jnp.where(ids >= w, ids - w, hw)  # row-0 roots have no parent (outside)
    lutF = jnp.concatenate([flatF, jnp.int32(hw)[None]])
    lutB = jnp.concatenate([flatB, jnp.int32(hw)[None]])
    fg_parent = lutF[up]   # for bg comp id b: enclosing fg comp (hw = outside)
    bg_parent = lutB[up]   # for fg comp id f: surrounding bg comp (hw = outside)

    # bg comps touching the border are outside, never holes
    border = jnp.concatenate([labB[0, :], labB[-1, :], labB[:, 0], labB[:, -1]])
    outside = jnp.zeros((hw + 1,), jnp.bool_).at[border].set(True)
    outside = outside.at[hw].set(True)

    # Violation check: bg comp H is NOT a hole if some 8-adjacent fg comp X is
    # neither H's enclosing comp nor nested inside H (bg_parent[X] != H).
    # Vectorised: gather the two per-pixel maps ONCE, then compare via cheap
    # neighbourhood shifts — 2 gathers + 1 scatter instead of 8 of each.
    fgp_pix = fg_parent[flatB].reshape(h, w)   # enclosing comp of my bg comp
    bgpar_pix = bg_parent[flatF].reshape(h, w)  # surrounding bg comp of my fg comp
    padF = jnp.pad(labF, 1, constant_values=hw)
    padP = jnp.pad(bgpar_pix, 1, constant_values=hw)
    labB2 = labB
    bad_any = jnp.zeros((h, w), jnp.bool_)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nbF = jax.lax.dynamic_slice(padF, (1 + dy, 1 + dx), (h, w))
            nbP = jax.lax.dynamic_slice(padP, (1 + dy, 1 + dx), (h, w))
            bad_any |= (nbF != hw) & (nbF != fgp_pix) & (nbP != labB2)
    viol = jnp.zeros((hw + 1,), jnp.bool_).at[flatB].max(
        (bad_any & ~mask).reshape(-1))
    hole = ~outside & ~viol & (fg_parent != hw)

    # absorb-root chase: nested fg comp -> enclosing fg comp (depth <= 4 real)
    rootF = ids
    for _ in range(4):
        b = bg_parent[rootF]
        rootF = jnp.where(hole[b], fg_parent[b], rootF)
    return labF, labB, rootF, hole


@partial(jax.jit, static_argnums=(1, 2))
def top_n_blobs(mask, n: int, iters: int = 4096):
    """Keep the ``n`` largest blobs with cv2 findContours(RETR_EXTERNAL) +
    drawContours(FILLED) semantics (reference tracker.py:65-77):

      * blobs nested inside another blob's hole are absorbed into the
        enclosing blob (RETR_EXTERNAL never lists them);
      * enclosing blobs are ranked by foreground pixel count (including
        absorbed nested blobs; the reference ranks by polygon ``contourArea``
        which can swap near-ties — see module docstring);
      * output is the FILLED region: holes and nested content come out white,
        background pockets jointly enclosed by several blobs stay black.

    Returns a boolean mask.
    """
    mask, (oh, ow) = _pad_tileable(mask.astype(jnp.bool_))
    labF = _propagate(mask, iters, connectivity=8)
    labB = _propagate(~mask, iters, connectivity=4)
    return _select_top_n(mask, labF, labB, n)[:oh, :ow]


def _select_top_n(mask, labF, labB, n: int):
    """Rank + paint given the label maps (pure gathers — vmappable)."""
    h, w = mask.shape
    hw = h * w
    _, _, rootF, hole = _component_tree_from_labels(mask, labF, labB)
    flatF = labF.reshape(-1)
    flatB = labB.reshape(-1)

    pix_rootF = rootF[flatF]                      # fg pixels -> top-level comp

    counts = (
        jnp.zeros((hw + 1,), jnp.float32)
        .at[pix_rootF]
        .add(mask.reshape(-1).astype(jnp.float32))
    )
    counts = counts.at[hw].set(0.0)
    top_vals, top_idx = jax.lax.top_k(counts, n)
    keep = jnp.zeros((hw + 1,), jnp.bool_).at[top_idx].set(top_vals > 0)

    out_fg = keep[pix_rootF] & mask.reshape(-1)
    # bg pixel painted iff its comp is a hole whose top-level owner is kept
    ids = jnp.arange(hw + 1, dtype=jnp.int32)
    up = jnp.where(ids >= w, ids - w, hw)
    lutF = jnp.concatenate([flatF, jnp.int32(hw)[None]])
    owner = rootF[lutF[up]]                       # bg comp id -> top-level owner
    out_bg = hole[flatB] & keep[owner[flatB]] & ~mask.reshape(-1)
    return (out_fg | out_bg).reshape(h, w)


def _min_prop_batch(region, init, connectivity: int, iters: int, labels=None):
    """Component broadcast over a (T, H, W) bool region: every pixel of each
    component converges to the MIN of ``init`` (int32) over that component;
    pixels outside the region = H*W.

    Seeding one value at a component's single root pixel (H*W everywhere
    else) broadcasts that value over the component — distinct components are
    never adjacent within their own region mask, so values cannot leak.

    TPU: one VMEM-resident Pallas fixpoint (same segmented-scan sweeps as the
    CC kernel).  Fallback: a scatter-min/gather through the component labels
    (``labels`` — passed in by callers that already ran CC on the region)."""
    t, h, w = region.shape
    if h % 8 == 0 and w % 128 == 0 and jax.default_backend() == "tpu":
        from openglottal_tpu.ops.blobs_pallas import min_prop_pallas_batch

        return min_prop_pallas_batch(region, init, connectivity,
                                     max(iters, 64) * 8)
    if labels is None:
        labels = jax.vmap(lambda m: _propagate(m, iters, connectivity))(region)
    hw = h * w

    def one(lab, ini, reg):
        lf = lab.reshape(-1)
        vals = jnp.where(reg.reshape(-1), ini.reshape(-1), hw)
        tbl = jnp.full((hw + 1,), hw, jnp.int32).at[lf].min(vals)
        return jnp.where(reg, tbl[lf].reshape(h, w), hw)

    return jax.vmap(one)(labels, init.astype(jnp.int32), region)


def _shift_down_frame(x, fill):
    """Frame-local shift: value of the pixel ABOVE (row r-1); row 0 -> fill."""
    top = jnp.full_like(x[:, :1, :], fill)
    return jnp.concatenate([top, x[:, :-1, :]], axis=1)


@partial(jax.jit, static_argnums=(1, 2))
def top_n_blobs_batch(masks, n: int, iters: int = 4096):
    """:func:`top_n_blobs` over a (T, H, W) stack of independent masks — the
    production path for the frame-parallel trackers (models/tracker.py).

    Same per-frame semantics, entirely different realization: the per-frame
    version's component-tree tables (HW-sized gathers/scatters) are replaced
    by label-propagation broadcasts, elementwise shifts, and one sort — ops
    that stay fast on TPU at any batch size (the table form compiled into
    serialized loop nests whose ~2 MB/frame of spill buffers got paged over
    the host tunnel under shared-HBM pressure: a stable ~4.9 s/call cliff).

      1. labF/labB: batched Pallas CC of mask (8-conn) / background (4-conn).
      2. Parent fields: at each component's root pixel (label == own index)
         the pixel directly above belongs to the enclosing region, so a
         min-propagation broadcast of that value over the component yields
         per-pixel enclosing-comp labels with no table lookups.
      3. cv2 FILLED-hole test (see :func:`top_n_blobs`): a background comp is
         a hole unless it touches the border or 8-touches a foreground comp
         that is neither its encloser nor nested inside it; the OR over the
         comp is a min-propagation of the negated seed.
      4. Absorb chase: a nested family {G ⊃ hole H ⊃ nested F ⊃ ...} is one
         connected cluster of (mask | hole pixels), and the top-level comp's
         root is the cluster's min flat index (each root's above-pixel lives
         in its encloser, so indices strictly decrease going up) — so ONE CC
         pass over that union replaces the rootF pointer chase, to arbitrary
         nesting depth.
      5. Rank: sort per-frame top-level owner labels of foreground pixels,
         run-length the sorted array, top_k on (size, smaller-label) packed
         scores.  Paint = elementwise compare against the n kept labels.
    """
    t = masks.shape[0]
    masks = masks.astype(jnp.bool_)
    ph = (-masks.shape[1]) % 8
    pw = (-masks.shape[2]) % 128
    oh, ow = masks.shape[1], masks.shape[2]
    if ph or pw:
        masks = jnp.pad(masks, ((0, 0), (0, ph), (0, pw)))
    h, w = masks.shape[1], masks.shape[2]
    hw = h * w
    big = jnp.int32(hw)
    idx = jnp.arange(hw, dtype=jnp.int32).reshape(1, h, w)
    bg = ~masks

    # mask (8-conn) and background (4-conn) are disjoint regions, so on TPU
    # each CC/broadcast PAIR merges into ONE dual-region fixpoint kernel
    # (blobs_pallas._make_dual_batch_kernel): one launch converging in the
    # MAX of the two regions' sweep counts instead of two paying the SUM
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from openglottal_tpu.ops.blobs_pallas import (
            dual_cc_pallas_batch,
            dual_min_prop_pallas_batch,
        )

        code = jnp.where(masks, jnp.int32(1), jnp.int32(2))
        labFB = dual_cc_pallas_batch(code, max(iters, 64) * 8)
        labF = jnp.where(masks, labFB, big)
        labB = jnp.where(bg, labFB, big)
    else:
        labF = _propagate_batch(masks, iters, connectivity=8)
        labB = _propagate_batch(bg, iters, connectivity=4)

    # enclosing fg comp per bg pixel / surrounding bg comp per fg pixel
    fgp_seed = jnp.where(bg & (labB == idx), _shift_down_frame(labF, big), big)
    bgp_seed = jnp.where(masks & (labF == idx), _shift_down_frame(labB, big),
                         big)
    if on_tpu:
        parent = dual_min_prop_pallas_batch(
            code, jnp.where(masks, bgp_seed, fgp_seed), max(iters, 64) * 8)
        fgp = jnp.where(bg, parent, big)
        bgp = jnp.where(masks, parent, big)
    else:
        fgp = _min_prop_batch(bg, fgp_seed, 4, iters, labels=labB)
        bgp = _min_prop_batch(masks, bgp_seed, 8, iters, labels=labF)

    # hole violation: an 8-adjacent fg comp that is neither my enclosing comp
    # nor nested inside my comp
    bad = jnp.zeros_like(masks)
    padF = jnp.pad(labF, ((0, 0), (1, 1), (1, 1)), constant_values=hw)
    padP = jnp.pad(bgp, ((0, 0), (1, 1), (1, 1)), constant_values=hw)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nbF = padF[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
            nbP = padP[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
            bad |= (nbF != big) & (nbF != fgp) & (nbP != labB)
    r = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
    border = (r == 0) | (r == h - 1) | (c == 0) | (c == w - 1)
    seed_nh = jnp.where(bg & (bad | border), 0, 1)   # 0 = definitely not hole
    nh = _min_prop_batch(bg, seed_nh, 4, iters, labels=labB)
    hole_pix = bg & (nh == 1) & (fgp != big)

    union = masks | hole_pix
    # warm-started CC of the union: seeding mask pixels with their already-
    # converged labF collapses every mask sub-component to its root value
    # up front, so the fixpoint only has to propagate across the hole
    # bridges (a few sweeps) instead of re-labelling from scratch.  Exactly
    # the same fixpoint: min-over-component of the seeds = min(labF roots,
    # hole pixel indices) = the component's min flat index, because every
    # mask pixel's index >= its labF root.
    owner = _min_prop_batch(
        union, jnp.where(masks, labF, jnp.where(hole_pix, idx, big)),
        8, iters)

    # rank by fg pixel count (ties -> smaller label), keep n, paint the union
    om = jnp.where(masks, owner, big).reshape(t, hw)
    # unstable sort: same values (scalar keys), ~1.6x faster on TPU than the
    # default stable sort (49 vs 77 ms for (512, 65536) i32 — a retired round-3 probe)
    s = jax.lax.sort(om, dimension=1, is_stable=False)
    pos = jnp.arange(hw, dtype=jnp.int32)[None, :]
    bnd = jnp.concatenate(
        [jnp.ones((t, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    nxt = jnp.concatenate(
        [jnp.where(bnd, pos, hw)[:, 1:], jnp.full((t, 1), hw, jnp.int32)],
        axis=1)
    nxt = jax.lax.cummin(nxt, axis=1, reverse=True)  # next boundary after i
    size = nxt - pos
    # (size desc, label asc) lexicographic top-n WITHOUT a packed key: the
    # int32 pack size*(hw+1)+(hw-1-label) overflows once a blob exceeds
    # 2^31/(hw+1) px (32767 px on a 256² frame — half the frame), silently
    # dropping the largest blobs.  top_k ranks sizes exactly; ties resolve
    # by n masked-min passes over the sorted labels (n is 1-2 in
    # production — far cheaper than a second full sort)
    size_key = jnp.where(bnd & (s < big), size, -1)
    topsz = jax.lax.top_k(size_key, n)[0]            # (t, n) descending
    prev_sz = jnp.full((t,), -2, jnp.int32)
    prev_lb = jnp.full((t,), -1, jnp.int32)
    klabs = []
    for j in range(n):
        szj = topsz[:, j]
        cand = (size_key == szj[:, None]) & (
            (szj != prev_sz)[:, None] | (s > prev_lb[:, None]))
        lb = jnp.where(cand, s, big).min(1)          # smallest unused label
        klabs.append(jnp.where(szj > 0, lb, big))
        prev_sz, prev_lb = szj, lb
    klab = jnp.stack(klabs, 1)                       # (t, n) kept labels
    keep = (owner[..., None] == klab[:, None, None, :]) & \
        (klab < big)[:, None, None, :]
    out = union & keep.any(-1)
    return out[:, :oh, :ow]


def roi_window_origin(boxes, h: int, w: int, win: int):
    """Per-frame (win, win) window origins containing each box plus a 1-px
    in-frame background margin.  Returns (fits, oy, ox): ``fits`` is True
    iff EVERY box is at most win-2 on both sides (callers fall back to the
    full-frame pass otherwise — one lax.cond branch executes).

    Origin covers [x1+1-win, x1+1) clamped in-frame; given the box fits,
    this also covers x0-1 (x1+1-win <= x0-1 ⟺ width <= win-2).  Shared by
    :func:`top_n_blobs_batch_roi` (which pins the windowed == full-frame
    equivalence in tests) and the guided-VFT tracker's fully-windowed tail
    (models/tracker.ygvft_parallel)."""
    boxes = boxes.astype(jnp.int32)
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    fits = jnp.all(((x1 - x0) <= win - 2) & ((y1 - y0) <= win - 2))
    ox = jnp.clip(x1 + 1 - win, 0, w - win)
    oy = jnp.clip(y1 + 1 - win, 0, h - win)
    return fits, oy, ox


def top_n_blobs_batch_roi(masks, boxes, n: int, win: int = 128,
                          iters: int = 4096):
    """:func:`top_n_blobs_batch` for masks CONFINED to per-frame boxes —
    the guided-VFT case, where raw = (dark ∧ in-bbox-ROI) zeroes everything
    outside ``boxes`` (models/tracker.py ygvft_parallel).

    Runs the identical machinery on a per-frame (win, win) window positioned
    to contain the box plus a 1-px in-frame background margin, then paints
    the result back into full frames.  Bit-identical to the full-frame pass:

      * fg components lie inside the box ⊆ window, so labels/sizes/ranking
        are unchanged (window-local label values differ but the selection is
        label-value-free: size-desc, smaller-label-asc ties pick the same
        components);
      * a bg component inside the window either is enclosed by fg (a true
        hole — fully inside the window by the margin) or reaches the
        outside-ROI background sea, which fills window-minus-box and touches
        the window border, so the border test gives the same verdict the
        frame border gives in the full-frame pass;
      * the hole-violation test only inspects fg comps and their 1-px bg
        neighbourhoods — all inside the window.

    The 4x pixel reduction (win=128 on 256² frames) cuts the fixpoint +
    ranking-sort cost that dominates the tracker (~266 of 268 ms/512 frames,
    scripts/perf_probe.py tracker) by ~4x and shortens propagation distances.

    Falls back to the full-frame pass (lax.cond — one branch executes) when
    any box exceeds win-2 on a side, so the contract never constrains box
    size.  Frames with empty masks (invalid/held-box frames) window anywhere
    and produce empty output either way.
    """
    t, hh, ww = masks.shape
    if hh < win or ww < win:
        return top_n_blobs_batch(masks, n, iters)
    fits, oy, ox = roi_window_origin(boxes, hh, ww, win)

    def windowed(m):
        sub = jax.vmap(
            lambda fr, yy, xx: jax.lax.dynamic_slice(fr, (yy, xx), (win, win))
        )(m, oy, ox)
        outw = top_n_blobs_batch(sub, n, iters)
        return jax.vmap(
            lambda s, yy, xx: jax.lax.dynamic_update_slice(
                jnp.zeros((hh, ww), jnp.bool_), s, (yy, xx))
        )(outw, oy, ox)

    return jax.lax.cond(fits, windowed,
                        lambda m: top_n_blobs_batch(m, n, iters), masks)


def largest_blob_batch(masks, iters: int = 4096):
    """Largest component per frame of a (T, H, W) stack."""
    return top_n_blobs_batch(masks, 1, iters)


def largest_blob(mask, iters: int = 4096):
    """Largest connected component (reference ``_blob``, tracker.py:57-63)."""
    return top_n_blobs(mask, 1, iters)
