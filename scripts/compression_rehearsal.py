#!/usr/bin/env python
"""One-command rehearsal of the full compression workflow on a toy dataset.

Chains the reference README's real pipeline (README.md:384-472 tables) as a
single scripted run with mAP/artifact gates at every stage:

  base train -> sparse train (BN-gamma L1) -> slim prune (bias-compensated
  no-finetune mAP holds) -> fine-tune: plain vs KD5 (KD must not lose) ->
  QAT (google, BN-fold) -> cos-PTQ calibration + true-int8 engine eval ->
  convert round-trip + FPGA export

and writes a RESULTS.md table shaped like the reference README's. This is
the regression net for the BASELINE.md north star "mAP delta <= 0.5 across
fp32/int8/pruned" that no single unit test provides (VERDICT r2 next #6).

Usage:  python scripts/compression_rehearsal.py [--workdir DIR] [--fast]
Test:   tests/test_pipeline.py drives run_rehearsal() and asserts gates.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# mini residual detector: a shortcut chain so slim prune exercises
# merge_mask across the chain (slim_prune.py:121-126 semantics)
REHEARSAL_CFG = """
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
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

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

# toy regime: no burn-in floor, no accumulation, boosted lr. 0.16 (the
# test_train_convergence value) collapses the residual rehearsal net to the
# no-object optimum; 0.04 converges to ~0.995 mAP in <100 epochs.
# (hyp*.txt format: the first two lines are a fixed header, config.py:146)
HYP_TINY = ('# toy hyp\n'
            '#\nlr0 0.04\nmomentum 0.937\nweight_decay 0.0\n')


def _toy_workspace(root: str, n_images: int = 16):
    """Synthetic single-class dataset (red box on dark ground)."""
    import cv2
    os.makedirs(f'{root}/images', exist_ok=True)
    os.makedirs(f'{root}/labels', exist_ok=True)
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n_images):
        img = np.full((96, 96, 3), 40, np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        bw, bh = 0.35, 0.3
        x1, y1 = int((cx - bw / 2) * 96), int((cy - bh / 2) * 96)
        x2, y2 = int((cx + bw / 2) * 96), int((cy + bh / 2) * 96)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), -1)
        p = f'{root}/images/im{i}.jpg'
        cv2.imwrite(p, img)
        with open(f'{root}/labels/im{i}.txt', 'w') as f:
            f.write(f'0 {cx} {cy} {bw} {bh}\n')
        paths.append(p)
    n_tr = max(n_images * 3 // 4, 1)
    with open(f'{root}/train.txt', 'w') as f:
        f.write('\n'.join(paths[:n_tr]))
    with open(f'{root}/valid.txt', 'w') as f:
        f.write('\n'.join(paths[n_tr:]))
    with open(f'{root}/obj.names', 'w') as f:
        f.write('thing\n')
    with open(f'{root}/obj.data', 'w') as f:
        f.write(f'classes=1\ntrain={root}/train.txt\n'
                f'valid={root}/valid.txt\nnames={root}/obj.names\n')
    with open(f'{root}/model.cfg', 'w') as f:
        f.write(REHEARSAL_CFG)
    with open(f'{root}/hyp.txt', 'w') as f:
        f.write(HYP_TINY)
    return root


def run_rehearsal(workdir: str, *, fast: bool = False, log=print) -> dict:
    """Run every stage; returns {stage: metrics} and writes RESULTS.md."""
    import jax
    from yolo_tpu.compress.prune import write_cfg
    from yolo_tpu.compress.prune_drivers import channel_prune
    from yolo_tpu.eval.evaluator import evaluate
    from yolo_tpu.models.darknet_io import (load_darknet_weights,
                                            save_darknet_weights)
    from yolo_tpu.runtime import load_model, preprocess
    from yolo_tpu.train.loop import TrainOptions, run_training
    from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from yolo_tpu.utils.profiling import count_params

    ws = _toy_workspace(os.path.join(workdir, 'ws'))
    cfg, data, hyp = f'{ws}/model.cfg', f'{ws}/obj.data', f'{ws}/hyp.txt'
    scale = 0.4 if fast else 1.0
    E = {k: max(int(v * scale), 8) for k, v in
         dict(base=240, sparse=90, ft=90, qat=60).items()}
    # the sparse stage needs ~60 epochs at s=0.03 for the gamma mass to
    # collapse (measured: 36 epochs -> masked mAP 0.29; 60 -> 0.995)
    E['sparse'] = max(E['sparse'], 60)
    R: dict = {}

    def train(tag, epochs, weights='', **kw):
        d = os.path.join(workdir, tag)
        os.makedirs(d, exist_ok=True)
        opt = TrainOptions(
            cfg=kw.pop('cfg', cfg), data=data, weights=weights,
            epochs=epochs, batch_size=4, img_size=(64, 64, 64),
            notest=True, n_burn_override=30, ema=False, augment=False,
            accumulate_override=1, hyp_path=hyp,
            weights_dir=d, results_file=os.path.join(d, 'results.txt'),
            device_mesh=False, seed=0, log_fn=lambda *a: None, **kw)
        r = run_training(opt)
        return float(r[2]), os.path.join(d, 'last.npz')

    def eval_npz(tag_cfg, weights, **kw):
        b = load_model(tag_cfg, weights, **kw)
        r, _, _ = evaluate(b.net, b.params, b.state, data, batch_size=4,
                           img_size=64, progress=False)
        return float(r[2])

    # ---- stage 1: baseline (doubles as the KD teacher) -------------------
    log('[1/7] training the fp32 baseline...')
    map_base, w_base = train('base', E['base'])
    R['base'] = {'mAP': map_base}
    log(f'      baseline mAP@0.5 = {map_base:.3f}')
    assert map_base > 0.5, f'baseline failed to converge: {map_base}'

    # ---- stage 2: sparse training (train.py --prune 1 --s) ---------------
    log('[2/7] sparse training (BN-gamma L1)...')
    # s=0.03 measured on this net: 84% of BN-gammas < 0.01 after the sparse
    # phase, and slim prune at 0.3 then holds mAP exactly; at s<=0.01 the
    # gammas stay too live and percent 0.3 kills the model
    map_sparse, w_sparse = train('sparse', E['sparse'], weights=w_base,
                                 prune=1, sparsity=0.03)
    R['sparse'] = {'mAP': map_sparse}
    log(f'      sparse mAP@0.5 = {map_sparse:.3f}')
    assert map_sparse > 0.4, f'sparse training collapsed: {map_sparse}'

    # ---- stage 3: slim prune (no-finetune mAP must hold) -----------------
    log('[3/7] slim pruning (bias-compensated, no finetune)...')
    b = load_model(cfg, w_sparse)
    res = channel_prune(b.net, b.params, b.state, method='slim',
                        percent=0.3, img_size=64)
    r_loose, _, _ = evaluate(b.net, res.loose_params, res.loose_state, data,
                             batch_size=4, img_size=64, progress=False)
    r_compact, _, _ = evaluate(res.net, res.params, res.state, data,
                               batch_size=4, img_size=64, progress=False)
    p_before, p_after = count_params(b.net), count_params(res.net)
    pruned_cfg = os.path.join(workdir, 'pruned.cfg')
    write_cfg(pruned_cfg, res.module_defs)
    w_pruned = os.path.join(workdir, 'pruned.npz')
    save_checkpoint(w_pruned, params=jax.device_get(res.params),
                    state=jax.device_get(res.state), epoch=-1)
    R['prune'] = {'mAP_masked': float(r_loose[2]),
                  'mAP_compact': float(r_compact[2]),
                  'params_before': int(p_before), 'params_after': int(p_after)}
    log(f"      masked {r_loose[2]:.3f} compact {r_compact[2]:.3f} "
        f"params {p_before} -> {p_after}")
    assert p_after < p_before, (p_before, p_after)
    assert r_loose[2] >= map_sparse - 0.15, \
        f'bias-compensated prune lost too much: {r_loose[2]} vs {map_sparse}'
    assert abs(r_compact[2] - r_loose[2]) < 0.05, \
        f'compact != masked: {r_compact[2]} vs {r_loose[2]}'

    # ---- stage 4: fine-tune — KD5 must beat (or match) plain -------------
    log('[4/7] fine-tuning the pruned model: plain vs KD5...')
    map_ft, _ = train('ft_plain', E['ft'], weights=w_pruned, cfg=pruned_cfg)
    map_kd, w_kd = train('ft_kd', E['ft'], weights=w_pruned, cfg=pruned_cfg,
                         t_cfg=cfg, t_weights=w_base, kd_strategy=5)
    R['finetune'] = {'mAP_plain': map_ft, 'mAP_kd5': map_kd}
    log(f'      plain {map_ft:.3f} KD5 {map_kd:.3f}')
    assert map_kd > 0.5, f'KD fine-tune failed to recover: {map_kd}'
    assert map_kd >= map_ft - 0.05, \
        f'KD5 fine-tune lost to plain fine-tune: {map_kd} vs {map_ft}'

    # ---- stage 5: QAT (google scheme, BN fold) ---------------------------
    log('[5/7] quantization-aware training (google a8/w8)...')
    map_qat, w_qat = train('qat', E['qat'], weights=w_kd, cfg=pruned_cfg,
                           quantized=1)
    R['qat'] = {'mAP': map_qat}
    log(f'      QAT mAP@0.5 = {map_qat:.3f}')
    assert map_qat >= map_kd - 0.2, f'QAT collapsed: {map_qat} vs {map_kd}'

    # ---- stage 6: cos-PTQ calibration + true-int8 engine -----------------
    log('[6/7] cos-PTQ calibration + int8 engine eval...')
    from yolo_tpu.compress.quant import QuantConfig
    from yolo_tpu.data.datasets import BatchLoader, DetectionDataset
    from yolo_tpu.models.int8_engine import make_int8_apply, prepare_int8
    qb = load_model(pruned_cfg, w_kd, quantized=3,
                    compute_dtype=np.float32)
    ds = DetectionDataset(f'{ws}/train.txt', 64, 4, subset_len=8, seed=0)
    calib = jax.jit(lambda p, s, q, x: qb._apply(p, s, q, x, True))
    state, qstate = qb.state, qb.qstate
    for imgs, _, _, _, _ in BatchLoader(ds, 4):
        _, state, qstate = calib(qb.params, state, qstate,
                                 preprocess(imgs, False))
    r_sim, _, _ = evaluate(qb.net, qb.params, state, data, batch_size=4,
                           img_size=64, progress=False,
                           quant_apply=qb._apply, qstate=qstate)
    qcfg = QuantConfig(scheme='ptq_cos', a_bits=8, w_bits=8)
    plan = prepare_int8(qb.net, qb.params, state, qstate, qcfg)
    eng = make_int8_apply(qb.net, plan)
    r_eng, _, _ = evaluate(
        qb.net, plan.arrays, {}, data, batch_size=4, img_size=64,
        progress=False,
        quant_apply=lambda pa, st, qs, x, train: (*eng(pa, x), []),
        qstate=None)
    R['ptq'] = {'mAP_sim': float(r_sim[2]), 'mAP_int8_engine': float(r_eng[2])}
    log(f'      PTQ sim {r_sim[2]:.3f} int8 engine {r_eng[2]:.3f}')
    assert r_sim[2] >= map_kd - 0.2, f'PTQ collapsed: {r_sim[2]} vs {map_kd}'
    assert r_eng[2] >= r_sim[2] - 0.1, \
        f'int8 engine diverges from the sim: {r_eng[2]} vs {r_sim[2]}'

    # ---- stage 7: convert round-trip + FPGA export -----------------------
    log('[7/7] convert round-trip + FPGA export...')
    ck = load_checkpoint(w_kd)
    pb = load_model(pruned_cfg)
    w_dark = os.path.join(workdir, 'pruned_kd.weights')
    save_darknet_weights(pb.net, ck['params'], ck['state'], w_dark)
    p2, s2, _, _ = load_darknet_weights(pb.net, pb.params, pb.state, w_dark)
    for k in ck['params']:
        for f in ck['params'][k]:
            np.testing.assert_array_equal(
                np.asarray(p2[k][f], np.float32),
                np.asarray(ck['params'][k][f], np.float32))
    import convert_FPGA as fpga_cli
    fpga_dir = os.path.join(workdir, 'fpga')
    cwd = os.getcwd()
    os.makedirs(fpga_dir, exist_ok=True)
    os.chdir(fpga_dir)
    try:
        fpga_cli.main(['--cfg', pruned_cfg, '--weights',
                       os.path.join(workdir, 'qat', 'last.npz'), '--reorder'])
    finally:
        os.chdir(cwd)
    fpga_files = []
    for root, _, files in os.walk(fpga_dir):
        fpga_files += [os.path.join(root, f) for f in files]
    R['export'] = {'weights_roundtrip': 'bit-exact',
                   'fpga_files': len(fpga_files)}
    assert fpga_files, 'FPGA export produced no artifacts'

    _write_results_md(os.path.join(workdir, 'RESULTS.md'), R)
    log(f"RESULTS.md written to {workdir}; all gates green")
    return R


def _write_results_md(path: str, R: dict):
    """Stage table shaped like the reference README's workflow tables
    (README.md:384-472)."""
    pr = R['prune']
    rows = [
        ('fp32 baseline', R['base']['mAP'], f"{pr['params_before']} params"),
        ('sparse (BN-γ L1)', R['sparse']['mAP'], 's=0.03'),
        ('slim prune 0.3 (masked, no finetune)', pr['mAP_masked'],
         'bias-compensated'),
        ('slim prune 0.3 (compact)', pr['mAP_compact'],
         f"{pr['params_after']} params "
         f"(-{100 * (1 - pr['params_after'] / pr['params_before']):.0f}%)"),
        ('pruned + plain fine-tune', R['finetune']['mAP_plain'], ''),
        ('pruned + KD5 fine-tune', R['finetune']['mAP_kd5'],
         'teacher = fp32 baseline'),
        ('+ QAT google a8/w8 (BN fold)', R['qat']['mAP'], ''),
        ('+ cos-PTQ a8/w8 (sim)', R['ptq']['mAP_sim'], 'no training'),
        ('+ cos-PTQ on the true-int8 engine', R['ptq']['mAP_int8_engine'],
         's8xs8->s32 MXU'),
    ]
    with open(path, 'w') as f:
        f.write('# Compression pipeline rehearsal — toy dataset\n\n'
                'Single scripted run of the full reference workflow '
                '(scripts/compression_rehearsal.py).\n\n'
                '| stage | mAP@0.5 | notes |\n|---|---|---|\n')
        for name, m, note in rows:
            f.write(f'| {name} | {m:.3f} | {note} |\n')
        f.write(f"\nWeights round-trip: {R['export']['weights_roundtrip']}; "
                f"FPGA export artifacts: {R['export']['fpga_files']} files.\n")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--workdir', type=str, default='rehearsal')
    p.add_argument('--fast', action='store_true',
                   help='~0.4x epochs per stage (CI regime)')
    opt = p.parse_args(argv)
    os.makedirs(opt.workdir, exist_ok=True)
    run_rehearsal(opt.workdir, fast=opt.fast)


if __name__ == '__main__':
    main()
