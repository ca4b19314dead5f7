"""yolo_tpu — TPU-native YOLOv2/v3/v4 training + model-compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SpursLipu/YOLOv3v4-ModelCompression-MultidatasetTraining-Multibackbone:

- Darknet ``.cfg``-defined detector zoo (yolov2/v3/v4, tiny, mobilenet/ghostnet/
  efficientnet backbones) compiled to a single jitted apply function
  (cfg -> typed graph IR -> XLA lowering; NO per-layer module interpreter).
- Multi-dataset training (.data descriptors), mosaic/affine/HSV augmentation.
- Compression toolchain: BN-gamma channel/layer pruning (6 algorithms +
  EagleEye search), QAT/PTQ power-of-2 quantization, knowledge distillation.
- SPMD data-parallel training over a ``jax.sharding.Mesh`` (ICI collectives
  emitted by XLA, no hand-written NCCL analogue).

Layout: activations NHWC, conv kernels HWIO, compute bfloat16 on the MXU with
float32 accumulation; all hot paths are static-shape and jit-compatible.
"""

__version__ = "0.1.0"

import os as _os

# Raise the TPU compiler's scoped-VMEM budget: measured on v5e (2026-08-18,
# PERFORMANCE.md) 65536 KiB wins ~3% on the 608px train step and ~2.5% on
# the int8-mixed serving pipeline — bigger fusion tiles on the HBM-bound
# stem. Set before the TPU backend initialises (any yolo_tpu import precedes
# first jax.devices() use in every CLI/bench entry point); user-provided
# values win; harmless where no libtpu is present.
if 'xla_tpu_scoped_vmem_limit_kib' not in _os.environ.get(
        'LIBTPU_INIT_ARGS', ''):
    _os.environ['LIBTPU_INIT_ARGS'] = (
        _os.environ.get('LIBTPU_INIT_ARGS', '') +
        ' --xla_tpu_scoped_vmem_limit_kib=65536').strip()
