"""Quantization subsystem tests: quantizer math, BN-fold QAT, TPSQ, cos-PTQ."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.compress import quant as Q
from yolo_tpu.ir import build_ir
from yolo_tpu.models.network import init_params, make_apply

from tests.test_trainer import TOY_CFG  # reuse the 3-conv toy network


@pytest.fixture(scope='module')
def toy(tmp_path_factory):
    p = tmp_path_factory.mktemp('qcfg') / 'toy.cfg'
    p.write_text(TOY_CFG)
    net = build_ir(str(p))
    params, state = init_params(jax.random.PRNGKey(0), net)
    rng = np.random.RandomState(0)
    for k in state:
        n = state[k]['mean'].shape[0]
        state[k] = {'mean': jnp.asarray(rng.randn(n).astype(np.float32) * 0.05),
                    'var': jnp.asarray(rng.uniform(0.8, 1.2, n).astype(np.float32))}
    return net, params, state


def test_round_half_away():
    x = jnp.array([0.5, -0.5, 1.4, -1.4, 2.5, -2.5])
    np.testing.assert_array_equal(np.asarray(Q.round_half_away(x)),
                                  [1, -1, 1, -1, 3, -3])


def test_pow2_snap():
    # tie at 3.0 resolves to floor (reference uses strict '<',
    # quantized_google.py:189-193)
    got = np.asarray(Q.pow2_snap(jnp.array([1.0, 1.4, 1.6, 3.0, 0.3])))
    np.testing.assert_allclose(got, [1.0, 1.0, 2.0, 2.0, 0.25])


def test_fake_quant_grid():
    """fq output lies on the scale grid and is a no-op at 32 bits."""
    x = jnp.linspace(-2, 2, 101)
    y = np.asarray(Q.fq(x, 2.0 ** -4, 0.0, 8))
    q = y / 2.0 ** -4
    np.testing.assert_allclose(q, np.round(q), atol=1e-5)
    assert np.abs(y - np.asarray(x)).max() <= 2.0 ** -5 + 1e-6


def test_fake_quant_ste_gradient():
    g = jax.grad(lambda x: jnp.sum(Q.fq(x, 0.1, 0.0, 8)))(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), 1.0)  # straight-through


def test_symmetric_scale_pow2():
    qs = Q.tracker_init()
    x = jnp.asarray(np.random.RandomState(0).randn(1000) * 3)
    _, qs = Q.google_quantize(x, qs, bits=8, train=True, freeze_step=10)
    scale = float(qs['scale'])
    assert math_is_pow2(scale * 128)


def math_is_pow2(v):
    import math
    l = math.log2(v)
    return abs(l - round(l)) < 1e-6


def test_scale_freeze():
    qs = Q.tracker_init()
    x1 = jnp.ones(10) * 4
    _, qs = Q.google_quantize(x1, qs, bits=8, train=True, freeze_step=1)
    s1 = float(qs['scale'])
    # second update beyond freeze step: scale must not move
    _, qs = Q.google_quantize(x1 * 100, qs, bits=8, train=True, freeze_step=1)
    assert float(qs['scale']) == s1


def test_global_vs_ema_tracker():
    qs = Q.tracker_init()
    qs = Q._update_range(qs, jnp.array([-1.0, 2.0]), 'global')
    # GlobalRangeTracker's in-place aliasing bug (quantized_google.py:46-54)
    # makes every post-first update track min(0, batch_min)/max(0, batch_max)
    # — the CURRENT batch's range, not an envelope. Mirrored for parity
    # (verified against torch in test_reference_parity).
    qs = Q._update_range(qs, jnp.array([-3.0, 1.0]), 'global')
    assert float(qs['min']) == -3.0 and float(qs['max']) == 1.0
    qs = Q._update_range(qs, jnp.array([-0.5, 0.25]), 'global')
    assert float(qs['min']) == -0.5 and float(qs['max']) == 0.25
    qe = Q.tracker_init()
    qe = Q._update_range(qe, jnp.array([0.0, 1.0]), 'ema')
    qe = Q._update_range(qe, jnp.array([0.0, 2.0]), 'ema')
    assert abs(float(qe['max']) - 1.1) < 1e-6  # 0.9*1 + 0.1*2


def test_tpsq_search_pow2_grad():
    v, g = jax.value_and_grad(lambda s: Q.search_pow2(s))(jnp.asarray(1.4))
    assert float(v) == 1.0
    np.testing.assert_allclose(float(g), 1.0 / 1.4, rtol=1e-5)


def test_tpsq_quantize_trains_scale():
    x = jnp.asarray(np.random.RandomState(1).randn(256) * 2)

    def loss(s):
        return jnp.mean((Q.tpsq_quantize(x, s, 8) - x) ** 2)

    s = jnp.asarray(4.0)
    g = jax.grad(loss)(s)
    assert np.isfinite(float(g))


def test_cospt_picks_reasonable_scale():
    qs = Q.cospt_init(8)
    x = jnp.asarray(np.random.RandomState(2).randn(4096).astype(np.float32))
    y, qs = Q.cospt_quantize(x, qs, bits=8, train=True)
    # |x| <= ~4 => float_range should be small power of two (2 or 4)
    scale = float(qs['scale']) * 128
    assert scale in (2.0, 4.0, 8.0), scale
    err = np.abs(np.asarray(y) - np.asarray(x)).mean()
    assert err < 0.02


def test_cospt_votes_accumulate():
    qs = Q.cospt_init(8)
    x = jnp.asarray(np.random.RandomState(3).randn(512).astype(np.float32))
    for _ in range(3):
        _, qs = Q.cospt_quantize(x, qs, bits=8, train=True)
    assert float(qs['votes'].sum()) == 3


@pytest.mark.parametrize('scheme', ['google', 'tpsq', 'ptq_cos'])
def test_quant_apply_runs(toy, scheme):
    net, params, state = toy
    cfg = Q.QuantConfig(scheme=scheme, a_bits=8, w_bits=8, steps=100)
    qstate, extra = Q.init_quant_state(net, cfg)
    p = {k: dict(v) for k, v in params.items()}
    for k, v in extra.items():
        p[k] = {**p[k], **v}
    apply = Q.make_quant_apply(net, cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 0.3 + 0.5
    (yolo_p, feats), new_state, new_q = apply(p, state, qstate, x, train=True)
    assert yolo_p[0].shape == (2, 3, 16, 16, 7)
    io, _, _ = apply(p, new_state, new_q, x, train=False)
    assert np.isfinite(np.asarray(io)).all()


def test_google_qat_matches_float_at_32bits(toy):
    """32-bit 'quantization' must reproduce the float BN-fold network."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=32, w_bits=32, steps=10)
    qstate, _ = Q.init_quant_state(net, cfg)
    apply_q = Q.make_quant_apply(net, cfg)
    apply_f = make_apply(net, compute_dtype=None)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.2
    io_q, _, _ = apply_q(params, state, qstate, x, train=False)
    io_f, _, _ = apply_f(params, state, x, train=False)
    np.testing.assert_allclose(np.asarray(io_q), np.asarray(io_f),
                               rtol=1e-3, atol=1e-4)


def test_google_qat_8bit_close_to_float(toy):
    """After calibration forwards, 8-bit fake-quant inference stays close to
    float (pow-2 scales, small toy net)."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    apply_q = Q.make_quant_apply(net, cfg)
    apply_f = make_apply(net, compute_dtype=None)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 0.3
    st, qs = state, qstate
    for _ in range(3):   # calibration
        _, st, qs = apply_q(params, st, qs, x, train=True)
    io_q, _, _ = apply_q(params, state, qs, x, train=False)
    io_f, _, _ = apply_f(params, state, x, train=False)
    # objectness probabilities should agree within a few percent
    diff = np.abs(np.asarray(io_q[..., 4]) - np.asarray(io_f[..., 4]))
    assert diff.mean() < 0.05, diff.mean()


def test_qat_gradients_flow(toy):
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    apply_q = Q.make_quant_apply(net, cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3)) * 0.3

    def loss(p):
        (yolo_p, _), _, _ = apply_q(p, state, qstate, x, train=True)
        return sum(jnp.sum(jnp.square(o)) for o in yolo_p)

    g = jax.grad(loss)(params)
    gn = sum(float(jnp.abs(v).sum()) for d in g.values() for v in d.values())
    assert np.isfinite(gn) and gn > 0


def test_quantize_input_16bit():
    x = jnp.asarray([0.123456789, -0.5, 0.9999])
    y = np.asarray(Q.quantize_input_16bit(x))
    np.testing.assert_allclose(y * (1 << 14), np.round(y * (1 << 14)), atol=1e-4)
    np.testing.assert_allclose(y, np.asarray(x), atol=2 ** -14)


@pytest.mark.parametrize('scheme,code', [('dorefa', 4), ('wbin', 5),
                                         ('ternary', 6)])
def test_legacy_scheme_qat_forward(toy, scheme, code):
    """The legacy quantizer families run as full QAT schemes: BN-fold conv
    with DoReFa/binary/ternary weight transforms (reference
    quantized_dorefa.py / quantized_lowbit.py modules, defined there but
    never wired into models.py — exposed here as --quantized 4/5/6)."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme=scheme, a_bits=8, w_bits=8, steps=100)
    qstate, extra = Q.init_quant_state(net, cfg)
    assert not extra                      # stateless: no trainable scales
    apply_q = Q.make_quant_apply(net, cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 0.3
    st, qs = state, qstate
    for _ in range(2):
        (yolo_p, _), st, qs = apply_q(params, st, qs, x, train=True)
    assert float(qs['0']['step']) == 2
    io, yolo_p, _ = apply_q(params, st, qs, x, train=False)
    assert all(np.isfinite(np.asarray(p)).all() for p in yolo_p)
    # boxes stay decodable: xywh finite, conf in [0, 1]
    conf = np.asarray(io[..., 4])
    assert conf.min() >= 0 and conf.max() <= 1

    def grads():
        def loss(p):
            (ps, _), _, _ = apply_q(p, state, qstate, x, train=True)
            return sum(jnp.sum(jnp.square(o)) for o in ps)
        return jax.grad(loss)(params)

    g = grads()   # STE: gradients flow through the quantizers
    gn = sum(float(jnp.abs(v).sum()) for d in g.values() for v in d.values())
    assert np.isfinite(gn) and gn > 0


def test_legacy_scheme_weight_grids(toy):
    """wbin weights land on {-1, +1}; ternary on {-a, 0, +a}; dorefa on the
    (2^b - 1)-level tanh grid in [-1, 1]."""
    from yolo_tpu.compress import quant_legacy as QL
    net, params, state = toy
    w = params['0']['w']
    b = np.unique(np.asarray(QL.binary_weight(w)))
    assert set(b) <= {-1.0, 1.0}
    t = np.unique(np.asarray(QL.ternary_weight(w)))
    assert len(t) <= 3 and 0.0 in t
    d = np.asarray(QL.dorefa_weight(w, 8))
    assert d.min() >= -1 and d.max() <= 1
    lv = np.unique(np.round((d + 1) / 2 * 255, 4))
    np.testing.assert_allclose(lv, np.round(lv), atol=1e-3)


def test_qat_bf16_matches_f32_calibration(toy):
    """bf16-compute QAT (the training default since r3, VERDICT r2 next #1):
    quantizer/tracker/BN-fold math stays f32 and the fake-quant edges are
    grid-exact in bf16, so calibration must land on the SAME pow-2 scales
    as the f32 path and the eval io must track it closely."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 0.3 + 0.5

    outs = {}
    for dt in (None, jnp.bfloat16):
        qstate, _ = Q.init_quant_state(net, cfg)
        apply = Q.make_quant_apply(net, cfg, compute_dtype=dt)
        st, qs = state, qstate
        for _ in range(4):
            (yolo_p, _), st, qs = apply(params, st, qs, x, train=True)
        io, _, _ = apply(params, st, qs, x, train=False)
        outs[dt] = (qs, np.asarray(io, np.float32),
                    np.asarray(yolo_p[0], np.float32))

    qs32, io32, _ = outs[None]
    qsbf, iobf, ybf = outs[jnp.bfloat16]
    # pow-2 scales: identical (tracker min/max of bf16-observed values can
    # only move within the pow-2 snap bucket for well-scaled activations)
    for k in qs32:
        for q in ('aq', 'wq', 'bq'):
            if isinstance(qs32[k], dict) and q in qs32[k]:
                np.testing.assert_array_equal(
                    np.asarray(qs32[k][q]['scale']),
                    np.asarray(qsbf[k][q]['scale']),
                    err_msg=f'{k}/{q} scale')
    # decoded io tracks the f32 path within bf16 conv rounding
    d = np.abs(io32[..., 4:] - iobf[..., 4:])
    assert d.mean() < 5e-3, d.mean()
    assert np.isfinite(ybf).all()


def test_qat_bf16_train_step_runs(toy):
    """bf16 QAT through the full jitted train step (grads in f32, bf16
    activations end-to-end, NHWC head layout)."""
    from yolo_tpu.train.loss import LossHyp, pad_targets
    from yolo_tpu.train.trainer import init_train_state, make_train_functions
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    qapply = Q.make_quant_apply(net, cfg, compute_dtype=jnp.bfloat16,
                                head_layout='nhwc')
    assert qapply.head_layout == 'nhwc'
    anchor_vecs = [l.anchors / l.yolo_stride for l in net.layers
                   if l.kind == 'yolo']
    grad_fn, update_fn = make_train_functions(
        net, anchor_vecs, nc=2, hyp=LossHyp(), optimizer='adam',
        quant_apply=qapply)
    ts = init_train_state(params, state, optimizer='adam', qstate=qstate)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    tgt, valid = pad_targets(
        [np.array([[1, .5, .5, .3, .3]], np.float32)] * 2, 8)
    for _ in range(2):
        ts, items = grad_fn(ts, imgs, jnp.asarray(tgt), jnp.asarray(valid),
                            1.0, 1.0)
    assert np.isfinite(np.asarray(items)).all()
    from yolo_tpu.train.schedules import burn_in_scalars
    scalars, _, _ = burn_in_scalars(1000, 500, 0, lr0=0.01, momentum=0.9,
                                    weight_decay=0.0, epochs=5, batch_size=2)
    ts = update_fn(ts, scalars)
    gsum = sum(float(jnp.abs(v).sum())
               for d in ts.params.values() for v in d.values())
    assert np.isfinite(gsum)


def test_quant_apply_nhwc_layout_matches(toy):
    """head_layout='nhwc' yolo_p is exactly the transpose of the
    anchor-major emission (same data, free reshape)."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 0.3 + 0.5
    am = Q.make_quant_apply(net, cfg)
    nh = Q.make_quant_apply(net, cfg, head_layout='nhwc')
    (p_am, _), st_a, qs_a = am(params, state, qstate, x, train=True)
    (p_nh, _), st_n, qs_n = nh(params, state, qstate, x, train=True)
    for a, n in zip(p_am, p_nh):
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(jnp.transpose(
                                          n, (0, 3, 1, 2, 4))))


def test_fpga_export_tpsq_scales(toy, tmp_path):
    """TPSQ scales are trainable params (not tracker state); the FPGA
    exporters must resolve them via search_pow2 with the int8-engine
    convention — quant step p2/(2^{b-1}-1), dequant shift -log2(p2/2^{b-1})
    (quantized_TPSQ.py:29-64, 78-118). Before this path existed the export
    silently wrote scale=1 streams for TPSQ models."""
    import types
    from yolo_tpu.compress.fpga_export import (export_fpga_weights,
                                               _conv_scales)
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='tpsq', a_bits=8, w_bits=8, steps=100)
    qstate, extra = Q.init_quant_state(net, cfg)
    p = {k: dict(v) for k, v in params.items()}
    for k, v in extra.items():
        p[k] = {**p[k], **v}
    # move scales off init so the test can distinguish resolved vs default
    for k in extra:
        p[k]['w_scale'] = jnp.asarray(3.7)    # search_pow2 -> 4.0
        p[k]['a_scale'] = jnp.asarray(9.0)    # -> 8.0
        p[k]['b_scale'] = jnp.asarray(0.6)    # -> 0.5
    bundle = types.SimpleNamespace(net=net, params=p, state=state,
                                   qstate=qstate, qcfg=cfg)
    (ws, wd), (bs_, bd), (as_, ad) = _conv_scales(bundle, '0')
    assert wd == 4.0 / 128 and ws == 4.0 / 127
    assert ad == 8.0 / 128 and bd == 0.5 / 128

    out = export_fpga_weights(bundle, outdir=str(tmp_path / 'fx'))
    w_shift = np.fromfile(f'{out}/w_scale.bin', '<i4')
    a_shift = np.fromfile(f'{out}/a_scale.bin', '<i4')
    n_convs = sum(l.kind in ('conv', 'depthwise') for l in net.layers)
    assert w_shift.shape == (n_convs,)
    # -log2(4/128) = 5 for every conv; a_scale has the Q7 input prefix
    assert (w_shift == 5).all()
    assert a_shift[0] == 7 and (a_shift[1:] == 4).all()
    # integer stream respects the saturating quant step
    w8 = np.fromfile(f'{out}/weights.bin', np.int8)
    assert np.abs(w8).max() <= 127 and np.abs(w8).sum() > 0


@pytest.mark.parametrize('scheme,code', [('google', 1), ('ptq_cos', 3)])
def test_quant_eval_sparse_matches_dense(toy, scheme, code):
    """Sparse-decode NMS for the quantized eval path (VERDICT r3 next #3):
    the heads-only twin of the fake-quant apply feeds
    non_max_suppression_heads; detections equal the dense (bs, N, 5+nc)
    io pipeline for a calibrated model."""
    from yolo_tpu.ops.nms import (non_max_suppression,
                                  non_max_suppression_heads)
    net, params, state = toy
    cfg = Q.QuantConfig(scheme=scheme, a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    dense_apply = Q.make_quant_apply(net, cfg)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 64, 3)) * 0.3
    qs = qstate
    st = state
    for _ in range(3):   # calibration
        _, st, qs = dense_apply(params, st, qs, x, train=True)

    sparse_apply = dense_apply.make_heads_only()
    yolos = [l for l in net.layers if l.kind == 'yolo']
    anchors = [l.anchors for l in yolos]
    strides = [l.yolo_stride for l in yolos]

    io, _, _ = dense_apply(params, state, qs, x, train=False)
    dense = np.asarray(non_max_suppression(io, conf_thres=0.01, top_k=64,
                                           max_det=16))
    heads, objs = sparse_apply(params, state, qs, x, train=False)
    sparse = np.asarray(non_max_suppression_heads(
        heads, anchors, strides, yolos[0].no, conf_thres=0.01, top_k=64,
        max_det=16, objs=objs))
    np.testing.assert_allclose(sparse, dense, rtol=1e-5, atol=1e-5)


def test_evaluate_quant_sparse_matches_dense(tmp_path):
    """evaluate(sparse=True) with a calibrated quant apply equals the dense
    evaluation end-to-end (lifts the r3 evaluator sparse lockout)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from yolo_tpu.eval.evaluator import evaluate

    ws = ge._make_toy_workspace(str(tmp_path / 'ws'))
    net = build_ir(f'{ws}/toy.cfg')
    params, state = init_params(jax.random.PRNGKey(0), net)
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    qapply = Q.make_quant_apply(net, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.3
    st, qs = state, qstate
    for _ in range(3):
        _, st, qs = qapply(params, st, qs, x, train=True)

    res = {}
    for sp in (False, True):
        res[sp] = evaluate(net, params, state, f'{ws}/obj.data',
                           batch_size=4, img_size=64, quant_apply=qapply,
                           qstate=qs, sparse=sp)
    r_d, maps_d, _ = res[False]
    r_s, maps_s, _ = res[True]
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(maps_s, maps_d, rtol=1e-5, atol=1e-6)


def test_bn_frozen_apply_drops_stat_conv(toy):
    """The post-freeze fast path emits one conv per quantized layer in the
    training graph (the full step carries the parallel float stat conv,
    reference quantized_google.py:325-334)."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    full = Q.make_quant_apply(net, cfg)
    frozen = full.make_bn_frozen()
    x = jnp.zeros((1, 64, 64, 3))

    def convs(apply):
        jpr = jax.make_jaxpr(lambda p, s, q, xx: apply(p, s, q, xx, True))(
            params, state, qstate, x)
        return str(jpr).count('conv_general_dilated')

    n_bn = sum(1 for l in net.layers if l.kind == 'conv' and l.bn)
    assert convs(full) - convs(frozen) == n_bn, (convs(full), convs(frozen))


def test_bn_frozen_matches_full_post_freeze(toy):
    """Post-freeze, the stat-conv-free step differs from the full step only
    by the momentum-0.01 running-stat drift: outputs agree tightly, the
    frozen step leaves the BN state exactly in place, and quantizer step
    counters keep advancing identically."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=10)
    qstate, _ = Q.init_quant_state(net, cfg)
    full = Q.make_quant_apply(net, cfg)
    frozen = full.make_bn_frozen()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3)) * 0.3
    # drive past BN_freeze_step (=9) with the full step
    st, qs = state, qstate
    for _ in range(10):
        (_, _), st, qs = full(params, st, qs, x, train=True)

    (yp_full, _), st_full, qs_full = full(params, st, qs, x, train=True)
    (yp_froz, _), st_froz, qs_froz = frozen(params, st, qs, x, train=True)
    for a, b in zip(yp_full, yp_froz):
        a, b = np.asarray(a), np.asarray(b)
        # the 1%-momentum drift can push a value across a fake-quant
        # rounding boundary (one 8-bit grid step); bound the fraction of
        # grid-flipped elements and the worst-case jump
        flipped = ~np.isclose(a, b, rtol=1e-2, atol=1e-2)
        assert flipped.mean() < 0.10, flipped.mean()
        assert np.abs(a - b).max() <= 0.26, np.abs(a - b).max()
    # frozen: BN state held exactly; steps advanced like the full step
    for k in st:
        np.testing.assert_array_equal(np.asarray(st_froz[k]['mean']),
                                      np.asarray(st[k]['mean']))
        assert not np.array_equal(np.asarray(st_full[k]['mean']),
                                  np.asarray(st[k]['mean']))
    for k in qs:
        if isinstance(qs[k], dict) and 'step' in qs[k]:
            assert float(qs_froz[k]['step']) == float(qs_full[k]['step'])


def test_qat_bn_fast_trajectory_across_boundary(tmp_path, monkeypatch):
    """run_training with qat_bn_fast switches programs at BN_freeze_step:
    per-step losses are IDENTICAL to the reference-exact run before the
    boundary and stay within the stat-drift envelope after it."""
    import os, re, sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from yolo_tpu.train.loop import TrainOptions, run_training

    ws = ge._make_toy_workspace(str(tmp_path / 'ws'))
    losses = {}
    for fast in (False, True):
        logs = []
        monkeypatch.chdir(tmp_path)
        run_training(TrainOptions(
            cfg=f'{ws}/toy.cfg', data=f'{ws}/obj.data', epochs=4,
            batch_size=2, img_size=(64, 64, 64), quantized=1,
            notest=True, nosave=True, ema=False, augment=False,
            qat_bn_fast=fast, device_mesh=False,
            log_fn=lambda *a, **k: logs.append(' '.join(map(str, a)))))
        vals = [float(v) for line in logs
                for v in re.findall(r'total (\S+)', line)]
        assert len(vals) == 16, (len(vals), logs[:3])
        losses[fast] = vals
    # n_train=8, bs=2 -> nb=4/epoch, 4 epochs = 16 steps = QuantConfig.steps
    # -> BN_freeze_step = 14: logged epoch-running-means 0..13 predate the
    # boundary and must be bit-identical; 14..15 include frozen steps and
    # may only drift within the 1%-momentum stat envelope
    freeze = 14
    assert losses[True][:freeze] == losses[False][:freeze]
    np.testing.assert_allclose(losses[True][freeze:], losses[False][freeze:],
                               rtol=0.05, atol=0.05)


def test_eval_snap_dtype_bf16_close_to_f32(toy):
    """eval_snap_dtype=bf16 (the fast QAT-eval snapping, PERFORMANCE.md
    quantized-eval): every dequantized activation stays on the same int8
    grid, and eval outputs track the f32 sim to boundary-rounding level —
    only elements whose x/scale sits within bf16 rounding of a 0.5
    boundary may move one quantum."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    calib = Q.make_quant_apply(net, cfg, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.3
    st, qs = state, qstate
    for _ in range(3):
        _, st, qs = calib(params, st, qs, x, train=True)

    f32 = Q.make_quant_apply(net, cfg, compute_dtype=jnp.bfloat16)
    fast = Q.make_quant_apply(net, cfg, compute_dtype=jnp.bfloat16,
                              eval_snap_dtype=jnp.bfloat16)
    io_a, p_a, _ = f32(params, st, qs, x, train=False)
    io_b, p_b, _ = fast(params, st, qs, x, train=False)
    # decoded boxes/conf: sub-quantum agreement
    np.testing.assert_allclose(np.asarray(io_b, np.float32),
                               np.asarray(io_a, np.float32),
                               rtol=0.05, atol=0.25)
    # raw heads nearly everywhere identical (boundary flips only)
    a = np.asarray(p_a[0], np.float32).ravel()
    b = np.asarray(p_b[0], np.float32).ravel()
    frac_diff = np.mean(np.abs(a - b) > 1e-6)
    assert frac_diff < 0.05, frac_diff


def test_prepare_eval_params_bit_identical(toy):
    """prepare_eval_params hoists the eval-constant BN fold + weight
    quantization into the params tree; qconv's prepared branch must be
    BIT-identical to the unprepared eval path (same math, just hoisted)."""
    net, params, state = toy
    cfg = Q.QuantConfig(scheme='google', a_bits=8, w_bits=8, steps=100)
    qstate, _ = Q.init_quant_state(net, cfg)
    apply = Q.make_quant_apply(net, cfg, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.3
    st, qs = state, qstate
    for _ in range(3):
        _, st, qs = apply(params, st, qs, x, train=True)

    io_a, p_a, _ = apply(params, st, qs, x, train=False)
    prep = Q.prepare_eval_params(net, cfg, params, st, qs)
    io_b, p_b, _ = apply(prep, st, qs, x, train=False)
    np.testing.assert_array_equal(np.asarray(io_a), np.asarray(io_b))
    for a, b in zip(p_a, p_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
