"""Crop-UNet pipeline geometry vs a cv2 oracle (reference
eval_girafe.unet_on_crop, :127-159): crop -> letterbox 256² (nearest) ->
U-Net -> threshold -> unletterbox (nearest) -> paste.  Same weights on both
paths, so any disagreement is geometry."""

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from openglottal_tpu.models.unet import UNet, init_unet
from openglottal_tpu.ops.resize import letterbox_info
from openglottal_tpu.pipelines import _crop_unet_chunk


def _oracle_unet_on_crop(gray, box, model, variables):
    x1, y1, x2, y2 = box
    crop = gray[y1:y2, x1:x2]
    if crop.size == 0:
        return np.zeros_like(gray, bool)
    ch, cw = crop.shape
    pt, pl, cth, ctw = letterbox_info(ch, cw, 256)
    boxed = np.zeros((256, 256), np.uint8)
    boxed[pt:pt + cth, pl:pl + ctw] = cv2.resize(
        crop, (ctw, cth), interpolation=cv2.INTER_NEAREST)
    x = (boxed.astype(np.float32) / 255.0)[None, ..., None]
    logits = model.apply(variables, jnp.asarray(x), train=False)
    m256 = (np.asarray(jax.nn.sigmoid(logits[0, ..., 0])) > 0.5).astype(np.uint8)
    content = m256[pt:pt + cth, pl:pl + ctw]
    back = content if (cth, ctw) == (ch, cw) else cv2.resize(
        content, (cw, ch), interpolation=cv2.INTER_NEAREST)
    full = np.zeros_like(gray, bool)
    full[y1:y2, x1:x2] = back > 0
    return full


def test_crop_unet_chunk_matches_cv2_oracle():
    model, variables = init_unet(jax.random.PRNGKey(3), size=256)
    rng = np.random.default_rng(5)
    gray = (rng.random((3, 256, 256)) * 255).astype(np.uint8)
    boxes = np.array([[60, 40, 180, 200], [10, 10, 80, 240], [100, 90, 156, 146]],
                     np.int32)
    valids = np.array([True, True, True])

    got = np.asarray(_crop_unet_chunk(variables, jnp.asarray(gray),
                                      jnp.asarray(valids), jnp.asarray(boxes),
                                      dtype=jnp.float32))
    for i in range(3):
        want = _oracle_unet_on_crop(gray[i], boxes[i], model, variables)
        agree = (got[i] == want).mean()
        # bf16/f32 sigmoid-threshold flips possible at exactly-0.5 pixels;
        # geometry must match everywhere else
        assert agree > 0.9995, f"frame {i}: agreement {agree}"


def test_crop_unet_invalid_box_empty():
    _, variables = init_unet(jax.random.PRNGKey(3), size=256)
    gray = np.full((1, 256, 256), 128, np.uint8)
    got = np.asarray(_crop_unet_chunk(variables, jnp.asarray(gray),
                                      jnp.asarray([False]),
                                      jnp.asarray([[0, 0, 0, 0]], np.int32),
                                      dtype=jnp.float32))
    assert not got.any()
