"""End-to-end compression-pipeline rehearsal (VERDICT r2 next #6).

One scripted run of the reference's real workflow on the toy dataset —
sparse-train -> slim-prune (no-finetune mAP holds) -> KD5-vs-plain
fine-tune -> QAT -> cos-PTQ + true-int8 engine -> convert round-trip +
FPGA export — with mAP/artifact gates asserted inside run_rehearsal at
every stage. This is the regression net for the BASELINE.md north star
"mAP delta <= 0.5 across fp32/int8/pruned".
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'scripts'))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_compression_rehearsal_all_stages_green(tmp_path, monkeypatch):
    from compression_rehearsal import run_rehearsal
    monkeypatch.chdir(tmp_path)
    R = run_rehearsal(str(tmp_path), fast=True, log=lambda *a: None)

    # the north star: compression must not move mAP more than 0.5 pts on
    # this (fully learnable) toy — every stage ships the gates internally,
    # this asserts the headline delta across fp32/pruned/int8
    m0 = R['base']['mAP']
    for stage, key in (('prune', 'mAP_compact'), ('finetune', 'mAP_kd5'),
                       ('qat', 'mAP'), ('ptq', 'mAP_int8_engine')):
        assert R[stage][key] >= m0 - 0.5, (stage, R[stage][key], m0)
    assert os.path.exists(tmp_path / 'RESULTS.md')
    txt = (tmp_path / 'RESULTS.md').read_text()
    assert 'true-int8 engine' in txt and 'fp32 baseline' in txt
    assert np.isfinite([v for d in R.values() for v in d.values()
                        if isinstance(v, float)]).all()
