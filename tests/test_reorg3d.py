"""Real reorg3d (space-to-depth) — the reference's dead block runs here.

The reference no-ops [reorg3d] (models.py:307-308), so its only user cfg,
cfg/yolov3/yolov3-spp-pan-scale.cfg (:773-791), crashes at the following
PAN route concats at every input size (verified: FeatureConcat gets a 2x
spatial mismatch). Differential parity is therefore unprovable — instead,
like the ASFF head fusion (tests/test_asff.py), the block is implemented
for real and covered by self-consistency tests: op-level oracle, IR
bookkeeping, full-cfg forward/train/sparse-infer, and darknet .weights
round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.ir import build_ir
from yolo_tpu.models.darknet_io import (load_darknet_weights,
                                        save_darknet_weights)
from yolo_tpu.models.network import init_params, make_apply
from yolo_tpu.ops.conv import space_to_depth
from yolo_tpu.utils.profiling import model_info

CFG = 'cfg/yolov3/yolov3-spp-pan-scale.cfg'


def test_space_to_depth_oracle():
    """(N,H,W,C) -> (N,H/s,W/s,s²C), channel index (sy*s + sx)*C + c."""
    rng = np.random.RandomState(0)
    x = rng.rand(2, 6, 4, 3).astype(np.float32)
    y = np.asarray(space_to_depth(jnp.asarray(x), 2))
    assert y.shape == (2, 3, 2, 12)
    for n in (0, 1):
        for i in range(3):
            for j in range(2):
                for sy in (0, 1):
                    for sx in (0, 1):
                        for c in range(3):
                            assert y[n, i, j, (sy * 2 + sx) * 3 + c] == \
                                x[n, 2 * i + sy, 2 * j + sx, c]


def test_space_to_depth_stride3():
    x = jnp.arange(1 * 6 * 6 * 2, dtype=jnp.float32).reshape(1, 6, 6, 2)
    y = space_to_depth(x, 3)
    assert y.shape == (1, 2, 2, 18)
    # block (0,0) of the input fills the first output cell's channels
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0]).reshape(3, 3, 2),
        np.asarray(x[0, :3, :3, :]))


def test_ir_bookkeeping():
    """reorg3d multiplies channels by stride² and downsample factor by
    stride, so every PAN concat in spp-pan-scale lines up and the heads
    land on strides 8/16/32."""
    net = build_ir(CFG)
    rg = [l for l in net.layers if l.kind == 'reorg3d']
    assert [(l.in_channels, l.filters) for l in rg] == \
        [(64, 256), (384, 1536), (1792, 7168), (7680, 30720)]
    assert [net.layers[i].yolo_stride for i in net.yolo_layers] == [8, 16, 32]
    info = model_info(net, img_size=416)
    assert info['params'] > 0 and info['macs'] > 0


@pytest.fixture(scope='module')
def spp_pan():
    net = build_ir(CFG)
    params, state = init_params(jax.random.PRNGKey(0), net)
    return net, params, state


def test_full_cfg_forward_and_sparse_infer(spp_pan):
    net, params, state = spp_pan
    size = 160                          # /32 with room for the reorg chain
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, size, size, 3))

    apply = make_apply(net, compute_dtype=jnp.float32)
    io, p, _ = apply(params, state, x, train=False)
    ncells = sum((size // s) ** 2 * net.layers[i].na
                 for s, i in zip([8, 16, 32], net.yolo_layers))
    assert io.shape == (1, ncells, 85)
    assert bool(jnp.isfinite(io).all())

    # sparse-infer (heads_only) path: raw NHWC head maps, matching shapes
    sparse = make_apply(net, compute_dtype=jnp.float32, heads_only=True)
    head_out, _ = sparse(params, state, x, train=False)
    for hm, s, i in zip(head_out, [8, 16, 32], net.yolo_layers):
        lyr = net.layers[i]
        assert hm.shape == (1, size // s, size // s, lyr.na * lyr.no)


def test_train_step_gradients_flow(spp_pan):
    """Backward through the reorg chain: grads reach the routed early
    layers (1, 5, 12, 37, 62) that feed the space-to-depth pyramid."""
    net, params, state = spp_pan
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 160, 160, 3))
    apply = make_apply(net, compute_dtype=jnp.float32)

    def loss_fn(p):
        (yolo_p, _), _ = apply(p, state, x, train=True)
        return sum(jnp.mean(jnp.square(q)) for q in yolo_p)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    for src in ('1', '5', '12', '37', '62'):
        g = grads[src]['w']
        assert float(jnp.abs(g).max()) > 0.0, f'dead gradient into layer {src}'


def test_darknet_weights_round_trip(spp_pan, tmp_path):
    """save -> load through our own writer/reader is the identity (the
    reference cannot exchange weights for this cfg: with a real reorg3d the
    post-reorg conv shapes differ from its broken no-op bookkeeping)."""
    net, params, state = spp_pan
    wpath = tmp_path / 'spp-pan.weights'
    save_darknet_weights(net, params, state, wpath)
    p2, s2, _, _ = load_darknet_weights(net, params, state, str(wpath))
    for k, v in params.items():
        for name, a in v.items():
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(p2[k][name]),
                                          err_msg=f'{k}/{name}')
    for k, v in state.items():
        for name, a in v.items():
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(s2[k][name]),
                                          err_msg=f'state {k}/{name}')
