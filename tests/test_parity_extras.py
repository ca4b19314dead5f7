"""Tests for the defined-but-unused reference modules implemented for full
inventory parity: FenceMask/GridMask, AdaBound, MixConv, KD6, FM loss."""

import numpy as np
import jax
import jax.numpy as jnp

from yolo_tpu.data.augment_extra import FenceMask, GridMask
from yolo_tpu.ops.conv import mixconv2d, mixconv_channel_split
from yolo_tpu.train.optim import (PerGroupScalars, adabound_init,
                                  adabound_update, label_tree)
from yolo_tpu.train import kd


def test_fence_mask():
    import random
    fm = FenceMask(batch_size=2, img_size=64, probability=1.0,
                   group_size=2, rng=random.Random(0))
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    y, masks = fm(x)
    assert y.shape == x.shape and masks is not None
    assert (y <= x + 1e-6).all()   # masks only attenuate
    fm.set_prob(0, 10)
    y2, m2 = fm(x)
    assert m2 is None              # prob ramped to 0 at epoch 0


def test_grid_mask():
    gm = GridMask(d1=16, d2=32, rotate=90, ratio=0.5, prob=1.0,
                  rng=np.random.default_rng(0))
    img = np.ones((64, 64, 3), np.float32)
    out = gm(img)
    frac = out.mean()
    assert 0.05 < frac < 0.95      # some pixels masked, some kept
    gm_inv = GridMask(d1=16, d2=32, rotate=1, ratio=0.5, mode=1, prob=1.0,
                      rng=np.random.default_rng(0))
    out2 = gm_inv(img)
    assert not np.allclose(out, out2)


def test_adabound_bounds_step():
    params = {'0': {'w': jnp.ones((4, 4)), 'b': jnp.zeros(4)}}
    grads = {'0': {'w': jnp.full((4, 4), 0.1), 'b': jnp.full(4, 0.1)}}
    st = adabound_init(params)
    lbl = label_tree(params)
    sc = PerGroupScalars(lr=jnp.full(4, 1e-3), weight_decay=jnp.zeros(4),
                         momentum=jnp.asarray(0.9))
    p2, st2 = adabound_update(params, grads, st, lbl, sc, base_lr=1e-3)
    assert float(jnp.abs(p2['0']['w'] - params['0']['w']).sum()) > 0
    assert int(st2.step) == 1
    # several steps stay finite
    for _ in range(5):
        p2, st2 = adabound_update(p2, grads, st2, lbl, sc, base_lr=1e-3)
    assert np.isfinite(np.asarray(p2['0']['w'])).all()


def test_mixconv():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 8).astype(np.float32))
    chs = mixconv_channel_split(24, ks=(3, 5), method='equal_ch')
    assert sum(chs) == 24
    ws = [jnp.zeros((3, 3, 8, chs[0])), jnp.zeros((5, 5, 8, chs[1]))]
    y = mixconv2d(x, ws, compute_dtype=None)
    assert y.shape == (1, 16, 16, 24)
    chp = mixconv_channel_split(24, ks=(3, 5), method='equal_params')
    assert sum(chp) == 24 and chp[0] > chp[1]  # small kernel gets more ch


def test_kd6():
    from tests.test_kd import _case
    out_s, out_t, tgt, valid, av, nc = _case(7)
    v_eq = kd.kd6(out_s, out_s, tgt, valid, av, nc, batch_size=2)
    assert abs(float(v_eq)) < 1e-5
    v = kd.kd6(out_s, out_t, tgt, valid, av, nc, batch_size=2)
    assert np.isfinite(float(v))


def test_failure_case_loss_fm():
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    from yolo_tpu.train.loss import pad_targets
    tgt, valid = pad_targets(
        [np.array([[0, .5, .5, .4, .4]], np.float32)] * 2, 8)
    v = kd.failure_case_loss_fm(masks, imgs, jnp.asarray(tgt),
                                jnp.asarray(valid))
    assert np.isfinite(float(v))
    assert float(kd.failure_case_loss_fm(None, imgs, tgt, valid)) == 0.0
