"""YOLO detection head: grid/anchor decode as a pure batched XLA op.

Reference: YOLOLayer (models.py:350-437). The reference caches grid tensors on
the module and mutates them per input size; here the grid is materialised by
``broadcasted_iota`` inside the jitted program (constant-folded by XLA).

Channel layout: a darknet YOLO-preceding conv emits na*(nc+5) channels ordered
anchor-major. With NHWC activations the reshape (bs, ny, nx, na, no) followed
by a transpose to (bs, na, ny, nx, no) reproduces the reference's
``p.view(bs, na, no, ny, nx).permute(0, 1, 3, 4, 2)`` (models.py:406).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def reshape_pred(x, na: int, no: int):
    """NHWC conv output (bs, ny, nx, na*no) -> raw prediction (bs, na, ny, nx, no)."""
    bs, ny, nx, _ = x.shape
    return x.reshape(bs, ny, nx, na, no).transpose(0, 3, 1, 2, 4)


def decode_yolo(p, anchors, stride: int):
    """Decode raw predictions to image-space boxes (inference path).

    p: (bs, na, ny, nx, no); anchors: (na, 2) in pixels; stride: layer stride.
    Returns io (bs, na*ny*nx, no): xywh in pixels, sigmoid(obj), sigmoid(cls).
    Matches reference models.py:411-418.
    """
    bs, na, ny, nx, no = p.shape
    anchor_vec = jnp.asarray(anchors, dtype=p.dtype) / stride       # (na, 2)

    gy = lax.broadcasted_iota(p.dtype, (ny, nx), 0)
    gx = lax.broadcasted_iota(p.dtype, (ny, nx), 1)
    grid = jnp.stack([gx, gy], axis=-1)[None, None]                  # (1,1,ny,nx,2)

    xy = (jax.nn.sigmoid(p[..., 0:2]) + grid) * stride
    wh = jnp.exp(p[..., 2:4]) * anchor_vec[None, :, None, None, :] * stride
    conf = jax.nn.sigmoid(p[..., 4:])
    io = jnp.concatenate([xy, wh, conf], axis=-1)
    return io.reshape(bs, -1, no)


def decode_yolo_nhwc(x, anchors, stride: int, no: int):
    """Decode straight from the NHWC head-conv output (bs, ny, nx, na*no).

    Same math as decode_yolo but without reshape_pred's (bs,na,ny,nx,no)
    permute — that transpose exists only to mirror the reference's training
    memory layout (models.py:406) and costs large f32 layout copies at
    inference (profiler: ~16% of the 608px pipeline). Box order differs
    (row-major vs anchor-major) which is irrelevant downstream (NMS re-ranks).
    """
    bs, ny, nx, _ = x.shape
    na = x.shape[-1] // no
    p = x.astype(jnp.float32).reshape(bs, ny, nx, na, no)
    anchor_vec = jnp.asarray(anchors, jnp.float32)                  # (na, 2)

    gy = lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    gx = lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None]           # (1,ny,nx,1,2)

    xy = (jax.nn.sigmoid(p[..., 0:2]) + grid) * stride
    wh = jnp.exp(p[..., 2:4]) * anchor_vec[None, None, None, :, :]
    conf = jax.nn.sigmoid(p[..., 4:])
    io = jnp.concatenate([xy, wh, conf], axis=-1)
    return io.reshape(bs, -1, no)
