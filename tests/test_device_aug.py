"""Device-side augmentation (data/device_aug.py) semantic tests on CPU."""

import numpy as np
import jax
import jax.numpy as jnp

from yolo_tpu.data.device_aug import (hsv_to_rgb, make_device_augment,
                                      rgb_to_hsv, PAD)


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def _mk_batch(bs=4, s=64, n_per=1):
    """Solid-colour images with one centered box each."""
    imgs = np.zeros((bs, s, s, 3), np.float32)
    targets, valid = np.zeros((bs * n_per * 8, 6), np.float32), \
        np.zeros(bs * n_per * 8, bool)
    for i in range(bs):
        imgs[i] = (i + 1) / (bs + 1)
        targets[i] = [i, 0, 0.5, 0.5, 0.4, 0.3]
        valid[i] = True
    return jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(valid)


def test_identity_no_mosaic():
    """Zero hyps + no mosaic/flip: images and labels pass through."""
    s = 64
    aug = make_device_augment(s, {}, mosaic=False, flip_lr=False)
    imgs, targets, valid = _mk_batch(s=s)
    out, nt, nv = aug(imgs, targets, valid, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-4)
    got = np.asarray(nt)[np.asarray(nv)]
    want = np.asarray(targets)[np.asarray(valid)]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mosaic_geometry():
    """With zero affine hyps, mosaic warps the 2s canvas: the output samples
    the window starting at (s/2, s/2) (border = -s/2 translate), i.e. the
    centre of the 2x2 grid; each output mixes 4 source images."""
    s = 64
    bs = 4
    aug = make_device_augment(s, {}, mosaic=True, flip_lr=False)
    imgs, targets, valid = _mk_batch(bs=bs, s=s)
    out, nt, nv = aug(imgs, targets, valid, jax.random.PRNGKey(1))
    o = np.asarray(out)
    # every output pixel comes from the canvas (batch colours) or the grey
    # border exposed by the random-window jitter
    colours = {(i + 1) / (bs + 1) for i in range(bs)} | {PAD}
    for i in range(bs):
        vals = {round(float(o[i, 2, 2, 0]), 4), round(float(o[i, 2, -3, 0]), 4),
                round(float(o[i, -3, 2, 0]), 4), round(float(o[i, -3, -3, 0]), 4)}
        for v in vals:
            assert any(abs(v - c) < 2e-3 for c in colours), (i, vals)
    # the random window varies across steps (host mosaic's random centre)
    o2 = np.asarray(aug(imgs, targets, valid, jax.random.PRNGKey(2))[0])
    assert not np.allclose(o, o2)
    # surviving labels stay inside [0,1]
    nt, nv = np.asarray(nt), np.asarray(nv)
    assert nv.sum() >= 1
    kept = nt[nv]
    assert (kept[:, 2:] >= 0).all() and (kept[:, 2:] <= 1).all()


def test_translate_moves_labels_with_pixels():
    """A pure translate must move image content and labels identically."""
    s = 64
    rng = np.random.RandomState(0)
    aug = make_device_augment(s, {'translate': 0.2}, mosaic=False,
                              flip_lr=False)
    imgs = np.full((1, s, s, 3), PAD, np.float32)
    imgs[0, 24:40, 16:32] = 0.9                       # box at x:[16,32) y:[24,40)
    targets = np.zeros((8, 6), np.float32)
    targets[0] = [0, 0, 24 / s, 32 / s, 16 / s, 16 / s]
    valid = np.zeros(8, bool); valid[0] = True
    out, nt, nv = aug(jnp.asarray(imgs), jnp.asarray(targets),
                      jnp.asarray(valid), jax.random.PRNGKey(3))
    out, nt, nv = np.asarray(out), np.asarray(nt), np.asarray(nv)
    assert nv[0]
    # locate the bright patch in the output and compare with the label
    ys, xs = np.where(out[0, :, :, 0] > 0.8)
    cx_pix, cy_pix = (xs.min() + xs.max() + 1) / 2, (ys.min() + ys.max() + 1) / 2
    assert abs(nt[0, 2] * s - cx_pix) < 1.5, (nt[0, 2] * s, cx_pix)
    assert abs(nt[0, 3] * s - cy_pix) < 1.5, (nt[0, 3] * s, cy_pix)


def test_flip_consistency():
    """Force flips by checking both possibilities of the coin."""
    s = 64
    aug = make_device_augment(s, {}, mosaic=False, flip_lr=True)
    imgs = np.full((2, s, s, 3), 0.1, np.float32)
    imgs[:, 28:36, 8:16] = 1.0                        # left-side patch
    targets = np.zeros((8, 6), np.float32)
    targets[0] = [0, 0, 12 / s, 32 / s, 8 / s, 8 / s]
    targets[1] = [1, 0, 12 / s, 32 / s, 8 / s, 8 / s]
    valid = np.zeros(8, bool); valid[:2] = True
    out, nt, nv = aug(jnp.asarray(imgs), jnp.asarray(targets),
                      jnp.asarray(valid), jax.random.PRNGKey(7))
    out, nt = np.asarray(out), np.asarray(nt)
    for i in range(2):
        ys, xs = np.where(out[i, :, :, 0] > 0.8)
        cx_pix = (xs.min() + xs.max() + 1) / 2
        assert abs(nt[i, 2] * s - cx_pix) < 1.5, (i, nt[i, 2] * s, cx_pix)


def test_rotation_drops_degenerate_boxes():
    """Large rotation keeps boxes finite, validity mask stays boolean."""
    s = 64
    aug = make_device_augment(s, {'degrees': 45, 'scale': 0.3,
                                  'shear': 10}, mosaic=False, flip_lr=False)
    imgs, targets, valid = _mk_batch(bs=2, s=s)
    out, nt, nv = aug(imgs, targets, valid, jax.random.PRNGKey(11))
    assert np.isfinite(np.asarray(out)).all()
    kept = np.asarray(nt)[np.asarray(nv)]
    if len(kept):
        assert (kept[:, 4:] > 0).all()
