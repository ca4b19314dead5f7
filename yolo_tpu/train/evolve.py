"""Hyper-parameter evolution (reference train.py:667-717 + print_mutation /
plot_evolution_results, utils/utils.py:1059-1097, 1319-1338)."""

from __future__ import annotations

import os

import numpy as np

from ..eval.metrics import fitness

# hyp keys in evolve.txt column order; gains control mutation strength per key
HYP_KEYS = ['giou', 'cls', 'cls_pw', 'obj', 'obj_pw', 'iou_t', 'lr0', 'lrf',
            'momentum', 'weight_decay', 'fl_gamma', 'hsv_h', 'hsv_s', 'hsv_v',
            'degrees', 'translate', 'scale', 'shear']
GAINS = np.array([1, 1, 1, 1, 1, 1, 1, 0, .1, 1, 0, 1, 1, 1, 1, 1, 1, 1])

LIMITS = {'lr0': (1e-5, 1e-2), 'iou_t': (0.0, 0.70), 'momentum': (0.60, 0.98),
          'weight_decay': (0, 0.001), 'hsv_s': (0, .9), 'hsv_v': (0, .9),
          'translate': (0, .9), 'scale': (0, .9), 'fl_gamma': (0, 3)}


def mutate_hyp(hyp: dict, evolve_file='evolve.txt', rng=None) -> dict:
    """One generation: select a parent from evolve.txt (fitness-weighted) and
    mutate (method 3, train.py:686-703). Returns the new hyp dict."""
    rng = np.random.default_rng() if rng is None else rng
    hyp = dict(hyp)
    if os.path.exists(evolve_file):
        x = np.loadtxt(evolve_file, ndmin=2)
        n = min(5, len(x))
        x = x[np.argsort(-fitness(x))][:n]
        w = fitness(x) - fitness(x).min() + 1e-6
        idx = rng.choice(n, p=w / w.sum())
        x = x[idx]
        mp, s = 0.9, 0.2
        ng = len(GAINS)
        v = np.ones(ng)
        while (v == 1).all():
            v = (GAINS * (rng.random(ng) < mp) * rng.standard_normal(ng)
                 * rng.random() * s + 1).clip(0.3, 3.0)
        for i, k in enumerate(HYP_KEYS):
            hyp[k] = float(x[i + 7] * v[i])   # results occupy cols 0-6
    for k, (lo, hi) in LIMITS.items():
        hyp[k] = float(np.clip(hyp[k], lo, hi))
    return hyp


def print_mutation(hyp: dict, results, evolve_file='evolve.txt',
                   bucket: str = ''):
    """Append (results, hyp) row, dedupe, keep fitness-sorted; with a
    bucket, download/merge/upload the fleet-shared evolve.txt
    (utils/utils.py:1059-1075)."""
    if bucket:
        from ..utils import gsutil
        gsutil.download_evolve(bucket, evolve_file)
    b = '%10.3g' * len(HYP_KEYS) % tuple(hyp[k] for k in HYP_KEYS)
    c = '%10.4g' * len(results) % tuple(results)
    print(f'\nEvolved fitness: {c}\n')
    with open(evolve_file, 'a') as f:
        f.write(c + b + '\n')
    x = np.unique(np.loadtxt(evolve_file, ndmin=2), axis=0)
    np.savetxt(evolve_file, x[np.argsort(-fitness(x))], '%10.3g')
    if bucket:
        from ..utils import gsutil
        gsutil.upload_evolve(bucket, evolve_file)


def plot_evolution_results(hyp: dict, evolve_file='evolve.txt',
                           save='evolve.png'):
    """Scatter fitness vs each hyp (utils/utils.py:1319-1338)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    if not os.path.exists(evolve_file):
        return None
    x = np.loadtxt(evolve_file, ndmin=2)
    f = fitness(x)
    fig, axes = plt.subplots(4, 5, figsize=(12, 10), tight_layout=True)
    for i, k in enumerate(HYP_KEYS):
        ax = axes.ravel()[i]
        y = x[:, i + 7]
        ax.plot(y, f, 'o', markersize=3)
        mu = y[f.argmax()] if len(f) else 0
        ax.set_title(f'{k} = {mu:.3g}', fontsize=8)
    fig.savefig(save, dpi=200)
    plt.close(fig)
    return save


def run_evolution(base_opt, hyp0: dict, generations: int = 10,
                  train_fn=None, evolve_file='evolve.txt', rng=None):
    """Evolution driver: mutate -> train -> record, ``generations`` times.
    ``train_fn(opt, hyp) -> results`` defaults to the full training loop."""
    if train_fn is None:
        from .loop import run_training

        def train_fn(opt, hyp):
            import dataclasses
            o = dataclasses.replace(opt, notest=True, nosave=True,
                                    hyp_path=None)
            # inject hyp via temp override
            from ..config import DEFAULT_HYP
            DEFAULT_HYP.update(hyp)   # scoped to the process, like reference
            return run_training(o)

    hyp = dict(hyp0)
    best = None
    for _ in range(generations):
        hyp = mutate_hyp(hyp, evolve_file, rng=rng)
        results = train_fn(base_opt, hyp)
        print_mutation(hyp, tuple(results), evolve_file)
        fi = float(fitness(np.array(results).reshape(1, -1))[0])
        if best is None or fi > best[0]:
            best = (fi, dict(hyp))
    plot_evolution_results(hyp, evolve_file)
    return best
