"""Full model-zoo coverage: every shipped .cfg builds an IR and profiles.

The reference cannot even parse some of these (efficientnetB0 fails its
field whitelist on 'probability', parse_config.py:40-49, and create_modules
has no 'avgpool'/'scale_channels' cases) — here the whole zoo must build.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.ir import build_ir
from yolo_tpu.models.network import init_params, make_apply
from yolo_tpu.utils.profiling import model_info


def _all_cfgs(repo_root):
    return sorted(glob.glob(os.path.join(repo_root, 'cfg/**/*.cfg'),
                            recursive=True))


def test_zoo_builds_and_profiles(repo_root):
    cfgs = _all_cfgs(repo_root)
    assert len(cfgs) >= 43
    for f in cfgs:
        net = build_ir(f)
        assert net.yolo_layers, f
        # every yolo head got a stride from the downsample analysis
        for li in net.yolo_layers:
            assert net.layers[li].yolo_stride in (8, 16, 32, 64), \
                (f, net.layers[li].yolo_stride)
        info = model_info(net, img_size=416)
        assert info['params'] > 0 and info['macs'] > 0, f


@pytest.mark.slow
def test_zoo_forwards(repo_root):
    """Every shipped cfg actually FORWARDS (eval mode, 128px, random init) —
    building an IR is not enough to claim a cfg runs. The reference cannot
    do this for its own zoo (efficientnetB0 fails its cfg-field whitelist,
    spp-pan-scale crashes on the reorg3d no-op, spp-matrix KeyErrors on
    stride_x/stride_y and hardcodes 3 strides for its 4 heads)."""
    for f in _all_cfgs(repo_root):
        net = build_ir(f)
        params, state = init_params(jax.random.PRNGKey(0), net)
        apply = make_apply(net, compute_dtype=jnp.float32)
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (1, 128, 128, net.in_channels))
        io, p, _ = apply(params, state, x, train=False)
        # anisotropic-stride cfgs (spp-matrix stride_x/stride_y) have
        # non-square grids, so count cells from the actual head maps
        ncells = sum(q.shape[1] * q.shape[2] * q.shape[3] for q in p)
        assert io.shape == (1, ncells, net.nc + 5), f
        assert len(p) == len(net.yolo_layers), f
        assert bool(jnp.isfinite(io).all()), f


def test_efficientnet_b0_forward(repo_root):
    """SE-via-cfg pattern: avgpool -> conv -> conv(logistic) -> scale_channels."""
    net = build_ir(os.path.join(
        repo_root, 'cfg/yolov3tiny-efficientnetB0/yolov3tiny-efficientnetB0.cfg'))
    kinds = {l.kind for l in net.layers}
    assert {'avgpool', 'scale_channels', 'dropout'} <= kinds
    params, state = init_params(jax.random.PRNGKey(0), net)
    apply = make_apply(net, compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 128, 3))
    io, p, _ = apply(params, state, x, train=False)
    assert io.shape[-1] == 85 and len(p) == 2
    assert bool(jnp.isfinite(io).all())
    # scale_channels output takes the `from` layer's spatial shape
    sc = next(l for l in net.layers if l.kind == 'scale_channels')
    assert sc.filters == net.layers[sc.layers[0]].filters


def test_yolov2_region_builds(repo_root):
    net = build_ir(os.path.join(repo_root, 'cfg/yolov2/yolov2.cfg'))
    assert net.yolo_layers
