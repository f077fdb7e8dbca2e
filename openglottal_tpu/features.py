"""Glottal area waveform -> kinematic features.

Reference semantics (openglottal/features.py:38-68):
  * silent waveform (max == 0) -> None
  * open_quotient = fraction of frames with area > 0.1 * mean
  * f0 = rfft peak frequency in cycles/frame, DC excluded; peak at bin 1 means
    "no reliable f0" -> None (callers multiply by capture_fps for Hz)
  * periodicity = max normalised autocorrelation at lags 1..49
  * cv = std / (mean + 1e-8)

The jnp core is jittable (returns an f0_valid flag instead of None); the host
wrapper reproduces the reference's dict-or-None API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_PERIODICITY_LAG = 50  # reference: ac[1:min(50, len(ac))] (features.py:58)


@jax.jit
def kinematic_features_jnp(area_wave):
    """Pure-jnp feature core over a (T,) waveform.

    Returns a dict of scalars; ``silent`` True means the reference would
    return None, ``f0_valid`` False means f0 would be None.
    """
    area = area_wave.astype(jnp.float32)
    t = area.shape[0]
    mean_a = area.mean()
    std_a = area.std()
    silent = area.max() == 0

    oq = jnp.mean((area > mean_a * 0.1).astype(jnp.float32))

    centered = area - mean_a
    fft = jnp.abs(jnp.fft.rfft(centered))
    freqs = jnp.fft.rfftfreq(t)
    peak_idx = jnp.argmax(fft[1:]) + 1
    f0_valid = peak_idx != 1
    f0 = freqs[peak_idx]

    # autocorrelation at lags 1..min(49, T-1): direct dot products — only
    # ~50 lags needed, cheaper than a full FFT correlation
    n_lags = min(MAX_PERIODICITY_LAG, t)
    ac0 = jnp.dot(centered, centered) + 1e-8
    lags = jnp.arange(1, n_lags)
    if n_lags > 1:
        def ac_at(k):
            m = jnp.arange(t) < (t - k)
            shifted = jnp.roll(centered, -k) * m
            return jnp.dot(centered, shifted)
        periodicity = jnp.max(jax.vmap(ac_at)(lags)) / ac0
    else:  # pragma: no cover — degenerate single-frame video
        periodicity = jnp.float32(0.0)

    return {
        "area_mean": mean_a,
        "area_std": std_a,
        "area_range": area.max() - area.min(),
        "open_quotient": oq,
        "f0": f0,
        "f0_valid": f0_valid,
        "periodicity": periodicity,
        "cv": std_a / (mean_a + 1e-8),
        "silent": silent,
    }


def kinematic_features(area_wave) -> dict | None:
    """Host API matching the reference ``_kinematic_features`` exactly:
    returns None for a silent waveform; f0 is None when the FFT peak lands on
    bin 1; includes the raw waveform under ``_area``."""
    area = np.asarray(area_wave, np.float64)
    if area.size == 0 or area.max() == 0:
        return None
    out = jax.device_get(kinematic_features_jnp(jnp.asarray(area)))
    return {
        "area_mean": float(out["area_mean"]),
        "area_std": float(out["area_std"]),
        "area_range": float(out["area_range"]),
        "open_quotient": float(out["open_quotient"]),
        "f0": float(out["f0"]) if bool(out["f0_valid"]) else None,
        "periodicity": float(out["periodicity"]),
        "cv": float(out["cv"]),
        "_area": area,
    }
