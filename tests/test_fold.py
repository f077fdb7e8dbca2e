"""Inference BatchNorm folding (models/fold.py): folded Conv(+bias)->act
models must match the unfolded Conv->BN->act models to float tolerance, with
non-trivial running statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglottal_tpu.models.fold import fold_unet, fold_yolo
from openglottal_tpu.models.unet import UNet, init_unet
from openglottal_tpu.models.yolo import YOLOv8, init_yolo

RNG = np.random.default_rng(42)


def _perturb_stats(variables, key=0):
    """Random running stats + BN affine params (init gives mean=0/var=1,
    which would make folding trivially correct)."""
    def rand_like(path, a):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        r = RNG.standard_normal(a.shape).astype(np.float32)
        if name == "var":
            return np.abs(r) + 0.3
        if name == "scale":
            return 1.0 + 0.3 * r
        return 0.5 * r  # mean / bias

    stats = jax.tree_util.tree_map_with_path(rand_like, variables["batch_stats"])
    params = variables["params"]

    def bn_affine(path, a):
        keys = [p.key for p in path if hasattr(p, "key")]
        if any(k.startswith("BatchNorm") for k in keys):
            return rand_like(path, a)
        return a

    params = jax.tree_util.tree_map_with_path(bn_affine, params)
    return {"params": params, "batch_stats": stats}


def test_unet_fold_matches():
    _, variables = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32)
    variables = _perturb_stats(variables)
    x = jnp.asarray(RNG.random((2, 64, 64, 1)), jnp.float32)
    ref = UNet(dtype=jnp.float32).apply(variables, x, train=False)
    out = UNet(dtype=jnp.float32, fuse_bn=True).apply(
        fold_unet(variables), x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_yolo_fold_matches():
    _, variables = init_yolo(jax.random.PRNGKey(1), dtype=jnp.float32)
    variables = _perturb_stats(variables)
    x = jnp.asarray(RNG.random((2, 64, 64, 3)), jnp.float32)
    ref = YOLOv8(nc=1, dtype=jnp.float32).apply(variables, x, train=False)
    out = YOLOv8(nc=1, dtype=jnp.float32, fuse_bn=True).apply(
        fold_yolo(variables), x, train=False)
    for (rb, rc), (ob, oc) in zip(ref, out):
        np.testing.assert_allclose(np.asarray(ob), np.asarray(rb),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(oc), np.asarray(rc),
                                   rtol=2e-3, atol=2e-3)


def test_gray_stem_fold_matches_broadcast():
    """fold_gray_stem: conv(bcast3(x), k) == conv(x, k.sum(axis=2)) — the
    1-channel stem must reproduce the replicated-channel path to float
    tolerance (exact up to one rounding of the summed kernel)."""
    from openglottal_tpu.models.fold import fold_gray_stem, yolo_stem_cin

    _, variables = init_yolo(jax.random.PRNGKey(2), dtype=jnp.float32)
    gray = jnp.asarray(RNG.random((2, 64, 64, 1)), jnp.float32)
    x3 = jnp.broadcast_to(gray, gray.shape[:3] + (3,))
    ref = YOLOv8(nc=1, dtype=jnp.float32).apply(variables, x3, train=False)
    gv = fold_gray_stem(variables)
    assert yolo_stem_cin(gv) == 1 and yolo_stem_cin(variables) == 3
    out = YOLOv8(nc=1, dtype=jnp.float32).apply(gv, gray, train=False)
    for (rb, rc), (ob, oc) in zip(ref, out):
        np.testing.assert_allclose(np.asarray(ob), np.asarray(rb),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(oc), np.asarray(rc),
                                   rtol=1e-4, atol=1e-4)
    # idempotent + composes with BN folding
    assert fold_gray_stem(gv) is gv
    assert yolo_stem_cin(fold_gray_stem(fold_yolo(variables))) == 1


def test_absorb_u8_scale_matches_normalized():
    """conv(x/255, k) == conv(x, k/255): feeding raw 0..255 pixels to
    u8-folded stems must reproduce the normalised path to float tolerance
    (uint8 values are exact in f32/bf16; only the stem kernel re-rounds)."""
    from openglottal_tpu.models.fold import (
        UNET_STEM, YOLO_STEM, absorb_u8_scale)

    _, uvars = init_unet(jax.random.PRNGKey(3), dtype=jnp.float32)
    raw = jnp.asarray(RNG.integers(0, 256, (2, 64, 64, 1)), jnp.float32)
    ref = UNet(dtype=jnp.float32).apply(uvars, raw / 255.0, train=False)
    out = UNet(dtype=jnp.float32).apply(
        absorb_u8_scale(uvars, UNET_STEM), raw, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # unfolded variables pass through untouched elsewhere in the tree
    assert uvars["params"]["DoubleConv_0"]["Conv_1"] is \
        absorb_u8_scale(uvars, UNET_STEM)["params"]["DoubleConv_0"]["Conv_1"]

    _, yvars = init_yolo(jax.random.PRNGKey(4), dtype=jnp.float32)
    raw3 = jnp.asarray(RNG.integers(0, 256, (2, 64, 64, 3)), jnp.float32)
    ref = YOLOv8(nc=1, dtype=jnp.float32).apply(yvars, raw3 / 255.0,
                                                train=False)
    out = YOLOv8(nc=1, dtype=jnp.float32).apply(
        absorb_u8_scale(yvars, YOLO_STEM), raw3, train=False)
    for (rb, rc), (ob, oc) in zip(ref, out):
        np.testing.assert_allclose(np.asarray(ob), np.asarray(rb),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(oc), np.asarray(rc),
                                   rtol=2e-3, atol=2e-3)


def test_fold_idempotent_without_stats():
    _, variables = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32)
    folded = fold_unet(variables)
    assert "batch_stats" not in folded
    assert fold_unet(folded) is folded


def test_fold_keeps_param_count():
    """Folding must preserve every conv and head param (BN params are
    absorbed, conv gains a bias)."""
    _, variables = init_unet(jax.random.PRNGKey(0), dtype=jnp.float32)
    folded = fold_unet(variables)
    flat = jax.tree_util.tree_leaves_with_path(folded["params"])
    names = ["/".join(p.key for p in path if hasattr(p, "key"))
             for path, _ in flat]
    assert not any("BatchNorm" in n for n in names)
    # every DoubleConv conv now has a bias
    assert sum(n.endswith("bias") and "Conv_" in n for n in names) >= 18
