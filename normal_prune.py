#!/usr/bin/env python
"""normal pruning CLI (reference normal_prune.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from yolo_tpu.compress.prune_cli import run_prune_cli

if __name__ == '__main__':
    run_prune_cli('normal')
