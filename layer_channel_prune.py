#!/usr/bin/env python
"""layer_channel pruning CLI (reference layer_channel_prune.py)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from yolo_tpu.compress.prune_cli import run_prune_cli

if __name__ == '__main__':
    run_prune_cli('layer_channel')
