"""Pallas kernel parity: the fused TPU suppression kernel (interpret mode on
CPU) must match the XLA while-loop path bit-for-bit in keep decisions and to
float tolerance in merged boxes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.ops.nms import _suppress_xla, non_max_suppression
from yolo_tpu.ops.pallas_nms import suppress


def _random_candidates(rng, bs=2, k=128):
    """Score-sorted candidate sets with heavy overlap (exercises chains)."""
    cx = rng.uniform(0, 200, (bs, k, 1))
    cy = rng.uniform(0, 200, (bs, k, 1))
    w = rng.uniform(5, 60, (bs, k, 1))
    h = rng.uniform(5, 60, (bs, k, 1))
    boxes = np.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    scores = np.sort(rng.uniform(0.05, 1.0, (bs, k)))[:, ::-1].copy()
    valid = scores > 0.1
    return (jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
            jnp.asarray(valid))


@pytest.mark.parametrize('merge', [True, False])
def test_suppress_kernel_matches_xla(merge):
    rng = np.random.default_rng(0)
    boxes, scores, valid = _random_candidates(rng)
    keep_p, merged_p = suppress(boxes, boxes, scores * valid, valid,
                                iou_thres=0.6, merge=merge, interpret=True)
    keep_x, merged_x = jax.vmap(
        lambda ob, b, s, v: _suppress_xla(ob, b, s, v, 0.6, merge, 16)
    )(boxes, boxes, scores, valid)
    np.testing.assert_array_equal(np.asarray(keep_p), np.asarray(keep_x))
    np.testing.assert_allclose(
        np.where(np.asarray(keep_p)[..., None], np.asarray(merged_p), 0),
        np.where(np.asarray(keep_x)[..., None], np.asarray(merged_x), 0),
        rtol=1e-5, atol=1e-4)


def test_nms_pallas_path_matches_xla_path():
    rng = np.random.default_rng(1)
    bs, n, nc = 2, 800, 8
    pred = np.zeros((bs, n, 5 + nc), np.float32)
    pred[..., 0:2] = rng.uniform(50, 350, (bs, n, 2))
    pred[..., 2:4] = rng.uniform(4, 80, (bs, n, 2))
    pred[..., 4] = rng.uniform(0, 1, (bs, n))
    pred[..., 5:] = rng.uniform(0, 1, (bs, n, nc))
    pred = jnp.asarray(pred)
    a = non_max_suppression(pred, conf_thres=0.3, top_k=256, use_pallas=False)
    b = non_max_suppression(pred, conf_thres=0.3, top_k=256, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-4)


def test_suppress_no_valid_candidates():
    boxes = jnp.zeros((1, 128, 4), jnp.float32)
    scores = jnp.zeros((1, 128), jnp.float32)
    valid = jnp.zeros((1, 128), bool)
    keep, merged = suppress(boxes, boxes, scores, valid, iou_thres=0.6,
                            interpret=True)
    assert not bool(keep.any())
    assert bool(jnp.isfinite(merged).all())
