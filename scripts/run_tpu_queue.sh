#!/bin/bash
# Serialized TPU measurement queue (one process at a time on the tunneled
# chip). Run detached: nohup bash scripts/run_tpu_queue.sh > /tmp/q.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# --- compression-training rows (VERDICT r2 next #1a) ---
# f32-vs-bf16 QAT at a size where f32 FITS (608/bs32 f32 OOMs)
python scripts/prof_train.py --quantized 1 --qat-dtype f32 \
    --qat-layout anchor_major --bs 64 --size 416
python scripts/prof_train.py --quantized 1 --qat-dtype bf16 --bs 64 --size 416
# TPSQ row
python scripts/prof_train.py --quantized 2 --qat-dtype bf16 --bs 64 --size 416
# KD row (608 like the float headline)
python scripts/prof_train.py --kd 5 --bs 64 --size 608
