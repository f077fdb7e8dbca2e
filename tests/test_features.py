"""Kinematic features vs a numpy transcription of the reference math
(openglottal/features.py:38-68)."""

import numpy as np

from openglottal_tpu.features import kinematic_features


def _reference_features(area_wave):
    area = np.array(area_wave)
    if area.max() == 0:
        return None
    mean_a = area.mean()
    std_a = area.std()
    oq = float(np.mean(area > mean_a * 0.1))
    fft = np.abs(np.fft.rfft(area - mean_a))
    freqs = np.fft.rfftfreq(len(area))
    peak_idx = int(np.argmax(fft[1:]) + 1)
    f0 = None if peak_idx == 1 else float(freqs[peak_idx])
    ac = np.correlate(area - mean_a, area - mean_a, mode="full")
    ac = ac[len(ac) // 2:]
    ac = ac / (ac[0] + 1e-8)
    periodicity = float(ac[1: min(50, len(ac))].max())
    return dict(area_mean=mean_a, area_std=std_a, area_range=area.max() - area.min(),
                open_quotient=oq, f0=f0, periodicity=periodicity,
                cv=std_a / (mean_a + 1e-8))


def test_sinusoid_f0_recovered():
    t = np.arange(512)
    area = 100 + 80 * np.sin(2 * np.pi * 0.05 * t)
    got = kinematic_features(area)
    # 0.05 cycles/frame; rfftfreq resolution 1/512
    assert abs(got["f0"] - 0.05) < 1 / 512
    assert got["periodicity"] > 0.95
    assert got["open_quotient"] == 1.0  # never below 0.1*mean


def test_matches_reference_math():
    rng = np.random.default_rng(7)
    for trial in range(6):
        t = int(rng.integers(60, 600))
        area = np.abs(rng.normal(50, 30, t)) * (rng.random(t) > 0.1)
        want = _reference_features(area)
        got = kinematic_features(area)
        for k in ("area_mean", "area_std", "area_range", "open_quotient",
                  "periodicity", "cv"):
            assert abs(got[k] - want[k]) < 1e-3 * max(1, abs(want[k])), (trial, k)
        if want["f0"] is None:
            assert got["f0"] is None
        else:
            assert abs(got["f0"] - want["f0"]) < 1e-6


def test_silent_returns_none():
    assert kinematic_features(np.zeros(100)) is None


def test_f0_none_at_bin_one():
    # single slow cycle -> FFT peak at bin 1 -> f0 unreliable (features.py:53-54)
    t = np.arange(128)
    area = 100 + 50 * np.sin(2 * np.pi * t / 128)
    assert kinematic_features(area)["f0"] is None
