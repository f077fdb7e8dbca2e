"""uint8 histogram-based ops: exact masked percentile and Otsu threshold.

The reference computes ``np.percentile(pixels_in_roi, pct)`` per frame inside
its tracker loops (openglottal/models/tracker.py:93,109,202,225) and Otsu
thresholds via cv2 (scripts/eval_girafe.py:162-171).  For uint8 pixels both are
*exactly* computable from a 256-bin histogram — O(HW + 256) per frame, fully
jittable, no data-dependent shapes (the masked-selection ``px = frame[roi]``
of the reference would be a dynamic shape under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_histogram_u8(values, mask):
    """256-bin histogram of ``values`` (any shape, 0..255) where ``mask`` is true.

    Computed as sort + 257 binary searches rather than a scatter-add: the
    vmapped scatter compiles to a serialized slow path on TPU (hundreds of
    ms per 512-frame batch), while batched sort + searchsorted stays ~1 ms.
    Counts are exact either way."""
    v = jnp.where(mask.reshape(-1), values.reshape(-1).astype(jnp.int32), 256)
    s = jax.lax.sort(v, is_stable=False)  # same values, faster on TPU
    edges = jnp.searchsorted(s, jnp.arange(257, dtype=jnp.int32), side="left")
    return (edges[1:] - edges[:-1]).astype(jnp.float32)


def percentile_from_hist(hist, q):
    """np.percentile(sorted_values, q) (linear interpolation) from a histogram.

    Returns (value, n) where n is the number of selected pixels; value is
    garbage when n == 0 (caller must gate on n, mirroring the reference's
    ``if px.size > 0`` fallbacks).
    """
    cum = jnp.cumsum(hist)
    n = cum[-1]
    rank = (q / 100.0) * jnp.maximum(n - 1.0, 0.0)
    k = jnp.floor(rank)
    frac = rank - k
    vals = jnp.arange(256, dtype=jnp.float32)
    # v_k = smallest value whose cumulative count exceeds k
    v_lo = vals[jnp.searchsorted(cum, k, side="right").clip(0, 255)]
    v_hi = vals[jnp.searchsorted(cum, k + 1.0, side="right").clip(0, 255)]
    return v_lo * (1.0 - frac) + v_hi * frac, n


def masked_percentile_sorted(values, mask, q):
    """Exact np.percentile(values[mask], q) via a sort — same result as
    ``percentile_from_hist(masked_histogram_u8(...))`` for integer-valued
    inputs, but scatter-free: the vmapped histogram's 256-bin scatter-add
    compiles to a serialized slow path on TPU (355 ms for 512 frames on the
    guided-VFT hot path), while a batched sort runs in ~1 ms.

    Returns (value, n); value is garbage when n == 0 (caller gates on n).
    """
    v = values.reshape(-1).astype(jnp.float32)
    m = mask.reshape(-1)
    n = m.sum().astype(jnp.float32)
    s = jax.lax.sort(jnp.where(m, v, jnp.float32(jnp.inf)), is_stable=False)
    rank = (q / 100.0) * jnp.maximum(n - 1.0, 0.0)
    k = jnp.floor(rank)
    frac = rank - k
    ki = k.astype(jnp.int32)
    last = jnp.maximum(n.astype(jnp.int32) - 1, 0)
    v_lo = s[jnp.minimum(ki, last)]
    v_hi = s[jnp.minimum(ki + 1, last)]
    # frac == 0 whenever ki lands on the last element, so v_hi's clipping
    # never changes the interpolated value — mirrors percentile_from_hist
    return v_lo * (1.0 - frac) + v_hi * frac, n


def masked_percentile_u8_batch(values, mask, q):
    """Batched exact ``np.percentile(values[t][mask[t]], q)`` for
    integer-valued [0, 255] pixels — the frame-parallel trackers' production
    percentile (models/tracker.py).

    Finds the two order statistics by bitwise binary search on the VALUE:
    8 count passes per order stat (compare + masked popcount), 16 passes
    total, all elementwise + reductions on the VPU.  The per-frame sort this
    replaces (``masked_percentile_sorted`` under vmap) costs ~80 ms per 512
    frames on TPU v5e (bitonic sort of (512, 65536)); the count passes run
    in a few ms.  Results are identical (pinned by tests/test_blur_hist.py).

    values: (T, ...) float, integer-valued; mask: same shape bool.
    Returns (value (T,) f32, n (T,) f32); value is garbage where n == 0
    (callers gate on n, mirroring the reference's ``if px.size`` fallbacks).
    """
    t = values.shape[0]
    v = values.reshape(t, -1).astype(jnp.int32)
    m = mask.reshape(t, -1)
    n = m.sum(1).astype(jnp.float32)
    rank = (q / 100.0) * jnp.maximum(n - 1.0, 0.0)
    k = jnp.floor(rank)
    frac = rank - k

    def order_stat(kk):
        """Smallest value s with count(masked <= s) >= kk + 1 == sorted[kk]."""
        thr = jnp.zeros((t,), jnp.int32)
        for bit in (128, 64, 32, 16, 8, 4, 2, 1):
            cand = thr + (bit - 1)
            cnt = (m & (v <= cand[:, None])).sum(1)
            thr = jnp.where(cnt >= kk + 1, thr, thr + bit)
        return thr.astype(jnp.float32)

    ki = k.astype(jnp.int32)
    last = jnp.maximum(n.astype(jnp.int32) - 1, 0)
    v_lo = order_stat(jnp.minimum(ki, last))
    v_hi = order_stat(jnp.minimum(ki + 1, last))
    return v_lo * (1.0 - frac) + v_hi * frac, n


def masked_percentile_u8(values, mask, q, fallback):
    """Exact np.percentile of uint8 ``values[mask]``; ``fallback`` when mask empty."""
    hist = masked_histogram_u8(values, mask)
    val, n = percentile_from_hist(hist, q)
    return jnp.where(n > 0, val, fallback)


def otsu_threshold(values, mask=None):
    """Otsu threshold of uint8 values (optionally masked), cv2 THRESH_OTSU semantics.

    Returns the threshold t; binarize with ``values > t`` (cv2 uses src > t for
    THRESH_BINARY). Reference call site: scripts/eval_girafe.py:162-171.
    """
    if mask is None:
        mask = jnp.ones(values.shape, jnp.bool_)
    hist = masked_histogram_u8(values, mask)
    n = hist.sum()
    p = hist / jnp.maximum(n, 1.0)
    vals = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(p)
    mu_cum = jnp.cumsum(p * vals)
    mu_total = mu_cum[-1]
    w1 = 1.0 - w0
    # between-class variance; guard empty classes like cv2 (skip when w0/w1 ~ 0)
    denom = w0 * w1
    sigma_b = jnp.where(denom > 1e-12, (mu_total * w0 - mu_cum) ** 2 / jnp.maximum(denom, 1e-12), -1.0)
    return jnp.argmax(sigma_b).astype(jnp.float32)
