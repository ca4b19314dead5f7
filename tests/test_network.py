"""Forward-pass correctness: shapes, torch-oracle golden checks, weights I/O.

torch (CPU) is used only as a numerical oracle for op semantics — the
framework itself is pure JAX.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.ir import build_ir
from yolo_tpu.models.network import Network, init_params, make_apply, fuse_params
from yolo_tpu.models.darknet_io import load_darknet_weights, save_darknet_weights

F32 = dict(compute_dtype=None)  # exact f32 compute for golden comparisons


def _build(repo_root, rel, **kw):
    model = Network.from_cfg(f'{repo_root}/cfg/{rel}', **kw)
    return model


def test_tiny_forward_shapes(repo_root):
    m = _build(repo_root, 'yolov3tiny/yolov3-tiny.cfg')
    x = jnp.zeros((1, 416, 416, 3), jnp.float32)
    (yolo_p, feats), new_state = m.apply(m.params, m.state, x, train=True)
    assert len(yolo_p) == 2
    assert yolo_p[0].shape == (1, 3, 13, 13, 85)   # stride 32
    assert yolo_p[1].shape == (1, 3, 26, 26, 85)   # stride 16
    assert len(feats) > 0
    assert new_state  # BN stats updated
    io, p, feats = m.apply(m.params, m.state, x, train=False)
    assert io.shape == (1, 3 * 13 * 13 + 3 * 26 * 26, 85)


def test_yolov3_forward_shapes(repo_root):
    m = _build(repo_root, 'yolov3/yolov3.cfg')
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    io, p, _ = m.apply(m.params, m.state, x, train=False)
    n = 3 * (10 * 10 + 20 * 20 + 40 * 40)
    assert io.shape == (1, n, 85)


@pytest.mark.parametrize('rel,size', [
    ('yolov4tiny/yolov4-tiny.cfg', 416),
    ('yolov3-mobilenet/yolov3-mobilenet-coco.cfg', 320),
])
def test_other_families_forward(repo_root, rel, size):
    m = _build(repo_root, rel)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    io, p, _ = m.apply(m.params, m.state, x, train=False)
    assert io.ndim == 3 and np.isfinite(np.asarray(io)).all()


def test_conv_bn_leaky_vs_torch():
    """Golden check of the conv+bn+leaky chain against torch (CPU oracle)."""
    import torch
    import torch.nn as nn
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 16, 16).astype(np.float32)          # NCHW for torch
    conv = nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
    bn = nn.BatchNorm2d(16, momentum=0.1)
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.uniform_(0.5, 1.5); bn.bias.data.normal_()
    bn.eval(); conv.eval()
    with torch.no_grad():
        ref = nn.functional.leaky_relu(bn(conv(torch.from_numpy(x))), 0.1).numpy()

    from yolo_tpu.ops import conv as conv_ops
    from yolo_tpu.ops import activations
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
    xn = jnp.asarray(x.transpose(0, 2, 3, 1))               # NCHW->NHWC
    y = conv_ops.conv2d(xn, jnp.asarray(w), stride=2, padding=1,
                        compute_dtype=None)
    y = conv_ops.batch_norm_infer(
        y, jnp.asarray(bn.weight.detach().numpy()),
        jnp.asarray(bn.bias.detach().numpy()),
        jnp.asarray(bn.running_mean.numpy()),
        jnp.asarray(bn.running_var.numpy()))
    y = activations.leaky(y)
    got = np.asarray(y).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_maxpool_vs_torch():
    import torch
    import torch.nn as nn
    from yolo_tpu.ops.conv import max_pool
    x = np.random.RandomState(1).randn(1, 4, 13, 13).astype(np.float32)
    # general case k=5 s=1 p=2 (spp)
    ref = nn.MaxPool2d(5, 1, 2)(torch.from_numpy(x)).numpy()
    got = np.asarray(max_pool(jnp.asarray(x.transpose(0, 2, 3, 1)), 5, 1))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)
    # tiny case k=2 s=1: zero-pad right/bottom (reference models.py:211-213)
    ref2 = nn.MaxPool2d(2, 1)(nn.ZeroPad2d((0, 1, 0, 1))(torch.from_numpy(x))).numpy()
    got2 = np.asarray(max_pool(jnp.asarray(x.transpose(0, 2, 3, 1)), 2, 1))
    np.testing.assert_allclose(got2.transpose(0, 3, 1, 2), ref2, atol=1e-6)


def test_batchnorm_train_vs_torch():
    import torch
    import torch.nn as nn
    from yolo_tpu.ops.conv import batch_norm_train
    x = np.random.RandomState(2).randn(4, 8, 6, 6).astype(np.float32)
    bn = nn.BatchNorm2d(8, momentum=0.1)
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    rm0, rv0 = bn.running_mean.numpy().copy(), bn.running_var.numpy().copy()
    bn.train()
    ref = bn(torch.from_numpy(x)).detach().numpy()
    y, nm, nv = batch_norm_train(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.ones(8), jnp.zeros(8),
        jnp.asarray(rm0), jnp.asarray(rv0))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nm), bn.running_mean.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nv), bn.running_var.numpy(), rtol=1e-5)


def test_s2d_stride2_conv_matches_standard():
    """conv2d_s2d_stride2 (space-to-depth stem rewrite, PERFORMANCE.md train
    trail) is numerics-identical to the standard stride-2 lowering — forward
    AND gradients."""
    from yolo_tpu.ops import conv as conv_ops
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 12, 16, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    ref = conv_ops.conv2d(x, w, stride=2, padding=1, compute_dtype=None)
    got = conv_ops.conv2d_s2d_stride2(x, w, compute_dtype=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return jax.grad(lambda x_, w_: jnp.sum(jnp.sin(fn(x_, w_))),
                        argnums=(0, 1))(x, w)

    gx_r, gw_r = loss(lambda a, b: conv_ops.conv2d(
        a, b, stride=2, padding=1, compute_dtype=None))
    gx_s, gw_s = loss(lambda a, b: conv_ops.conv2d_s2d_stride2(
        a, b, compute_dtype=None))
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_r),
                               rtol=1e-5, atol=1e-5)


def test_s2d_apply_matches_standard_apply(repo_root):
    """make_apply(s2d_min_hw=...) rewrites only the gated stride-2 convs and
    the whole-net training forward stays numerically identical."""
    net = build_ir(f'{repo_root}/cfg/yolov3/yolov3.cfg')   # conv-downsampled
    params, state = init_params(jax.random.PRNGKey(0), net)
    x = jnp.asarray(np.random.RandomState(4).rand(1, 96, 96, 3)
                    .astype(np.float32))
    base = make_apply(net, compute_dtype=None)
    s2d = make_apply(net, compute_dtype=None, s2d_min_hw=48)
    (yp_b, _), _ = base(params, state, x, train=True)
    (yp_s, _), _ = s2d(params, state, x, train=True)
    for a, b in zip(yp_b, yp_s):
        # same multiply-adds, different summation order: f32 roundoff
        # accumulates through the 75-conv graph
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-4)


def test_upsample_nearest():
    from yolo_tpu.ops.conv import upsample_nearest
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample_nearest(x, 2)
    expect = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
                      np.float32)
    np.testing.assert_array_equal(np.asarray(y)[0, :, :, 0], expect)


def test_darknet_weights_roundtrip(repo_root, tmp_path):
    m = _build(repo_root, 'yolov3tiny/yolov3-tiny.cfg')
    path = tmp_path / 'rt.weights'
    save_darknet_weights(m.net, m.params, m.state, path)
    # fresh init, load back, compare bit-exact
    m2 = _build(repo_root, 'yolov3tiny/yolov3-tiny.cfg',
                rng=jax.random.PRNGKey(123))
    params, state, version, seen = load_darknet_weights(
        m2.net, m2.params, m2.state, path)
    for k in m.params:
        for f in m.params[k]:
            np.testing.assert_array_equal(np.asarray(m.params[k][f]),
                                          np.asarray(params[k][f]), err_msg=f'{k}/{f}')
    for k in m.state:
        for f in m.state[k]:
            np.testing.assert_array_equal(np.asarray(m.state[k][f]),
                                          np.asarray(state[k][f]))


def test_fuse_preserves_output(repo_root):
    m = _build(repo_root, 'yolov3tiny/yolov3-tiny.cfg')
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3)) * 0.1 + 0.5
    apply_f32 = make_apply(m.net, compute_dtype=None)
    io_ref, _, _ = apply_f32(m.params, m.state, x, train=False)
    fused = fuse_params(m.net, m.params, m.state)
    apply_fused = make_apply(m.net, compute_dtype=None, fused=True)
    io_fused, _, _ = apply_fused(fused, m.state, x, train=False)
    np.testing.assert_allclose(np.asarray(io_ref), np.asarray(io_fused),
                               rtol=1e-3, atol=1e-4)


def test_decode_matches_reference_math():
    """YOLO decode vs a hand-written numpy port of YOLOLayer (models.py:411-418)."""
    from yolo_tpu.models.yolo_head import decode_yolo
    rng = np.random.RandomState(3)
    p = rng.randn(2, 3, 4, 5, 7).astype(np.float32)  # nc=2
    anchors = np.array([[10, 13], [16, 30], [33, 23]], np.float32)
    stride = 32
    io = np.asarray(decode_yolo(jnp.asarray(p), anchors, stride))

    def sigmoid(v):
        return 1 / (1 + np.exp(-v))
    ref = p.copy()
    yv, xv = np.meshgrid(np.arange(4), np.arange(5), indexing='ij')
    grid = np.stack((xv, yv), 2)[None, None].astype(np.float32)
    ref[..., :2] = sigmoid(ref[..., :2]) + grid
    ref[..., 2:4] = np.exp(ref[..., 2:4]) * (anchors / stride)[None, :, None, None, :]
    ref[..., :4] *= stride
    ref[..., 4:] = sigmoid(ref[..., 4:])
    np.testing.assert_allclose(io, ref.reshape(2, -1, 7), rtol=1e-5, atol=1e-5)


def test_decode_nhwc_matches_permuted_decode(repo_root):
    """Transpose-free inference decode produces the same boxes as the
    torch-layout decode, just in (y,x,a) instead of (a,y,x) order."""
    import numpy as np
    from yolo_tpu.models.yolo_head import (decode_yolo, decode_yolo_nhwc,
                                           reshape_pred)
    rng = np.random.RandomState(0)
    bs, ny, nx, na, no = 2, 5, 7, 3, 9
    x = jnp.asarray(rng.randn(bs, ny, nx, na * no).astype(np.float32))
    anchors = np.array([[10, 13], [16, 30], [33, 23]], np.float32)
    io_old = decode_yolo(reshape_pred(x, na, no), anchors, 16)
    io_new = decode_yolo_nhwc(x, anchors, 16, no)
    reord = np.asarray(io_old).reshape(bs, na, ny, nx, no) \
        .transpose(0, 2, 3, 1, 4).reshape(bs, -1, no)
    np.testing.assert_allclose(np.asarray(io_new), reord, rtol=1e-6, atol=1e-5)
