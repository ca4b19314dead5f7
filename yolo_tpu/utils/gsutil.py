"""gsutil bucket sync (reference train.py:527-528, 587 and
utils/utils.py:1059-1075 shell out to `gsutil cp` for results/evolve/weight
artifacts). Kept as a tiny subprocess wrapper with an injectable runner so
tests can assert the exact transfers without GCS credentials; failures are
logged, never fatal (the reference's os.system ignores the exit code too).
"""

from __future__ import annotations

import os
import subprocess


def _run(cmd):
    try:
        return subprocess.run(cmd, check=False).returncode
    except OSError as e:          # gsutil not installed
        print(f'gsutil sync skipped: {e}')
        return -1


runner = _run   # tests monkeypatch this


def cp(src, dst):
    """`gsutil cp src dst` (either side may be a gs:// URI)."""
    return runner(['gsutil', 'cp', str(src), str(dst)])


def sync_results(bucket: str, name: str, results_file='results.txt'):
    """Per-epoch results upload (reference train.py:527-528)."""
    if bucket and name:
        cp(results_file, f'gs://{bucket}/results/results{name}.txt')


def download_evolve(bucket: str, evolve_file='evolve.txt'):
    """Fetch the shared evolve.txt before mutating (train.py:669-670)."""
    if bucket:
        cp(f'gs://{bucket}/evolve.txt', evolve_file)


def upload_evolve(bucket: str, evolve_file='evolve.txt'):
    """Publish the appended evolve.txt (utils/utils.py:1073-1075)."""
    if bucket:
        cp(evolve_file, f'gs://{bucket}/evolve.txt')


def upload_weights(bucket: str, path):
    """End-of-training checkpoint upload (train.py:587). The destination
    names the object explicitly (weights/<basename>): the reference's bare
    `gs://bucket/weights` only lands inside a folder when a weights/ prefix
    already exists — on a fresh bucket gsutil treats it as the object name
    and the second upload silently overwrites the first."""
    if bucket:
        cp(path, f'gs://{bucket}/weights/{os.path.basename(str(path))}')
