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

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.compress import quant as Q
from yolo_tpu.eval.evaluator import evaluate
from yolo_tpu.runtime import load_model, preprocess
from yolo_tpu.train.loop import TrainOptions, run_training

from tests.test_cli import TOY_CFG


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    """Noisy-background variant of test_cli's toy dataset.

    The flat-background toy is degenerate under 8-bit quantization: every
    background cell's obj logit is IDENTICAL, so the whole image crosses
    conf_thres as one block and mAP flips chaotically on sub-percent BN
    running-stat differences (ranking ties between the FP flood and the
    targets). Textured backgrounds break the tie and make mAP measure
    quantization quality instead of tie-ordering.

    Also denser than test_cli's toy: 16 images x 3 boxes, ALL evaluated
    (48 targets), so mAP granularity is ~2% and a small-delta quality
    gate is meaningful (2 images / 2 targets quantize recall to 50%)."""
    root = tmp_path_factory.mktemp('qws')
    (root / 'images').mkdir()
    (root / 'labels').mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(16):
        img = rng.randint(20, 70, (96, 96, 3)).astype(np.uint8)
        rows = []
        # 3 boxes on a 3-column grid so they never overlap
        for j, colc in enumerate((0.18, 0.5, 0.82)):
            cx = colc + rng.uniform(-0.04, 0.04)
            cy = rng.uniform(0.2, 0.8)
            bw, bh = 0.22, 0.22
            x1, y1 = int((cx - bw / 2) * 96), int((cy - bh / 2) * 96)
            x2, y2 = int((cx + bw / 2) * 96), int((cy + bh / 2) * 96)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), -1)
            rows.append(f'0 {cx} {cy} {bw} {bh}')
        p = root / 'images' / f'im{i}.jpg'
        cv2.imwrite(str(p), img)
        (root / 'labels' / f'im{i}.txt').write_text('\n'.join(rows) + '\n')
        paths.append(str(p))
    (root / 'train.txt').write_text('\n'.join(paths[:12]))
    (root / 'valid.txt').write_text('\n'.join(paths))
    (root / 'obj.names').write_text('thing\n')
    (root / 'obj.data').write_text(
        f'classes=1\ntrain={root}/train.txt\nvalid={root}/valid.txt\n'
        f'names={root}/obj.names\n')
    (root / 'toy.cfg').write_text(TOY_CFG)
    return root


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
            # 160 epochs = 320 steps: the faithful BN-fold EMAs running
            # stats from the LOADED float checkpoint (never first-batch
            # overwritten, quantized_google.py:341-346), so the finetune
            # must run long enough for momentum-0.01 stats to converge to
            # the QAT-era distribution — as any real-scale QAT run does.
            epochs=160, batch_size=4, img_size=(64, 64, 64), notest=True,
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
