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
