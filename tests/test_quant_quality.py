"""End-to-end quantization quality gates (VERDICT r1 next-round #6).

The BASELINE.md quantization table is the contract: quantized models must
track their float baselines within fractions of an mAP point. These tests
reproduce that contract at toy scale:

  - google-QAT / TPSQ finetuned toy mAP within 0.02 of the fp32 toy mAP
    (reference workflow: train float, then --quantized finetune,
    /root/reference/train.py:135-142);
  - the true-int8 MXU engine's eval mAP within 0.02 of the fake-quant sim
    it was lowered from;
  - cos-similarity PTQ scale search at least as faithful to the float
    network as naive minmax scales (reference quantized_ptq_cos.py:72-88
    vs the minmax trackers of quantized_google.py).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.compress import quant as Q
from yolo_tpu.eval.evaluator import evaluate
from yolo_tpu.runtime import load_model, preprocess
from yolo_tpu.train.loop import TrainOptions, run_training

from tests.test_cli import workspace  # noqa: F401  (toy dataset fixture)


@pytest.fixture(scope='module')
def trained_toy(workspace, tmp_path_factory):  # noqa: F811
    """fp32 toy detector trained to high mAP; returns (dir, fp32_map)."""
    d = tmp_path_factory.mktemp('qq')
    hyp = d / 'hyp.txt'
    hyp.write_text('# hyp\n#\nlr0 0.16\nmomentum 0.937\nweight_decay 0.0\n')
    cwd = os.getcwd()
    os.chdir(d)
    try:
        r = run_training(TrainOptions(
            cfg=str(workspace / 'toy.cfg'), data=str(workspace / 'obj.data'),
            epochs=250, batch_size=4, img_size=(64, 64, 64), notest=True,
            n_burn_override=30, ema=False, augment=False,
            accumulate_override=1, hyp_path=str(hyp),
            weights_dir=str(d / 'weights'), log_fn=lambda *a, **k: None))
    finally:
        os.chdir(cwd)
    fp32_map = r[2]
    assert fp32_map > 0.5, f'fp32 toy baseline failed to train: {fp32_map}'
    return d, float(fp32_map)


def _qat_finetune_map(workspace, trained_toy, tmp_path, scheme_id):  # noqa: F811
    d, fp32_map = trained_toy
    hyp = tmp_path / 'hyp.txt'
    # QAT finetune regime: Adam (forced by quantized != -1), gentle lr
    hyp.write_text('# hyp\n#\nlr0 0.002\nmomentum 0.937\nweight_decay 0.0\n')
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        r = run_training(TrainOptions(
            cfg=str(workspace / 'toy.cfg'), data=str(workspace / 'obj.data'),
            weights=str(d / 'weights' / 'last.npz'),
            quantized=scheme_id, a_bit=8, w_bit=8,
            epochs=40, batch_size=4, img_size=(64, 64, 64), notest=True,
            n_burn_override=0, ema=False, augment=False,
            accumulate_override=1, hyp_path=str(hyp),
            weights_dir=str(tmp_path / 'weights'),
            log_fn=lambda *a, **k: None))
    finally:
        os.chdir(cwd)
    return float(r[2]), fp32_map


def test_google_qat_toy_map(workspace, trained_toy, tmp_path):  # noqa: F811
    """google-QAT finetune holds toy mAP within 0.02 of fp32."""
    qat_map, fp32_map = _qat_finetune_map(workspace, trained_toy, tmp_path, 1)
    assert qat_map > fp32_map - 0.02, (qat_map, fp32_map)


def test_tpsq_toy_map(workspace, trained_toy, tmp_path):  # noqa: F811
    """TPSQ (trainable pow-2 scale) finetune holds toy mAP within 0.02."""
    qat_map, fp32_map = _qat_finetune_map(workspace, trained_toy, tmp_path, 2)
    assert qat_map > fp32_map - 0.02, (qat_map, fp32_map)


def _calibrated_ptq(workspace, trained_toy, scheme):  # noqa: F811
    """Load the trained toy under a PTQ scheme and run calibration
    forwards over the train images (PTQ.py calibration loop)."""
    d, _ = trained_toy
    scheme_id = {'google': 1, 'tpsq': 2, 'ptq_cos': 3}[scheme]
    b = load_model(str(workspace / 'toy.cfg'),
                   str(d / 'weights' / 'last.npz'), quantized=scheme_id,
                   a_bit=8, w_bit=8, compute_dtype=jnp.float32)
    import cv2
    imgs = []
    for line in open(workspace / 'train.txt').read().split():
        im = cv2.imread(line)[:, :, ::-1]
        imgs.append(cv2.resize(im, (64, 64)))
    x = preprocess(np.stack(imgs), False)
    calib = jax.jit(lambda p, s, q, xx: b._apply(p, s, q, xx, True))
    state, qstate = b.state, b.qstate
    for _ in range(4):
        _, state, qstate = calib(b.params, state, qstate, x)
    return b, state, qstate, x


def test_int8_engine_map_matches_sim(workspace, trained_toy):  # noqa: F811
    """True-int8 engine eval mAP within 0.02 of the fake-quant sim's."""
    from yolo_tpu.models.int8_engine import make_int8_apply, prepare_int8
    b, state, qstate, _ = _calibrated_ptq(workspace, trained_toy, 'ptq_cos')
    kw = dict(batch_size=2, img_size=64, iouv=(0.5,))
    r_sim, _, _ = evaluate(b.net, b.params, state,
                           str(workspace / 'obj.data'),
                           quant_apply=b._apply, qstate=qstate, **kw)
    qcfg = Q.QuantConfig(scheme='ptq_cos', a_bits=8, w_bits=8)
    plan = prepare_int8(b.net, b.params, state, qstate, qcfg)
    eng = make_int8_apply(b.net, plan)
    r_eng, _, _ = evaluate(
        b.net, plan.arrays, {}, str(workspace / 'obj.data'),
        quant_apply=lambda pa, st, qs, x, train: (*eng(pa, x), []),
        qstate=None, **kw)
    assert r_eng[2] > r_sim[2] - 0.02, (r_eng[2], r_sim[2])


def test_cos_ptq_at_least_as_faithful_as_minmax(workspace, trained_toy):  # noqa: F811
    """cos-search PTQ io fidelity >= naive minmax PTQ fidelity on the
    trained toy (the google scheme's global minmax trackers ARE the naive
    baseline when used calibration-only)."""
    f = load_model(str(workspace / 'toy.cfg'),
                   str(trained_toy[0] / 'weights' / 'last.npz'))
    bc, sc, qc, x = _calibrated_ptq(workspace, trained_toy, 'ptq_cos')
    bm, sm, qm, _ = _calibrated_ptq(workspace, trained_toy, 'google')
    io_f, _, _ = f._apply(f.params, f.state, x.astype(jnp.float32), False)
    io_c, _, _ = bc._apply(bc.params, sc, qc, x, False)
    io_m, _, _ = bm._apply(bm.params, sm, qm, x, False)

    def fidelity(io_q):
        a = np.asarray(io_q, np.float64).ravel()
        b_ = np.asarray(io_f, np.float64).ravel()
        return float(a @ b_ / (np.linalg.norm(a) * np.linalg.norm(b_)))

    fc, fm = fidelity(io_c), fidelity(io_m)
    assert fc > 0.98, fc
    assert fc >= fm - 1e-4, (fc, fm)
