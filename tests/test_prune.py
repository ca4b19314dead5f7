"""Pruning subsystem tests.

The load-bearing invariant (reference prune_utils.py:261-335): after masking
gamma/beta and transferring dead-channel activations into consumer layers,
the COMPACT re-emitted network computes the same function as the masked
full-size network — and approximately the same as the original when the
pruned gammas were near zero.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.compress import prune as P
from yolo_tpu.compress.prune_drivers import (channel_prune, eagle_eye_prune,
                                             layer_prune, layer_channel_prune)
from yolo_tpu.ir import build_ir
from yolo_tpu.models.network import init_params, make_apply
from yolo_tpu.utils.profiling import count_macs, count_params

MINI_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=leaky

[upsample]
stride=2

[route]
layers=-1,4

[convolutional]
batch_normalize=1
filters=24
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=0
filters=21
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=2
num=3
"""


# yolov3-style residual stack (shortcut from=-3) — the topology layer-prune's
# [idx-1, idx, idx+1] triple removal is defined for (layer_prune.py:107-123)
RES_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
batch_normalize=1
filters=16
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-3
activation=linear

[convolutional]
batch_normalize=1
filters=24
size=1
stride=1
pad=1
activation=leaky

[convolutional]
batch_normalize=0
filters=21
size=1
stride=1
pad=1
activation=linear

[yolo]
mask=0,1,2
anchors=10,13, 16,30, 33,23
classes=2
num=3
"""


def _mini(tmp_path_factory, cfg_text=MINI_CFG, name='mini.cfg'):
    p = tmp_path_factory.mktemp('pcfg') / name
    p.write_text(cfg_text)
    net = build_ir(str(p))
    params, state = init_params(jax.random.PRNGKey(0), net)
    # make BN stats non-trivial
    rng = np.random.RandomState(0)
    for k in state:
        n = state[k]['mean'].shape[0]
        state[k] = {'mean': jnp.asarray(rng.randn(n).astype(np.float32) * 0.1),
                    'var': jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))}
        params[k] = dict(params[k])
        params[k]['beta'] = jnp.asarray(rng.randn(n).astype(np.float32) * 0.5)
        params[k]['gamma'] = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
    return net, params, state


@pytest.fixture(scope='module')
def mini(tmp_path_factory):
    return _mini(tmp_path_factory)


@pytest.fixture(scope='module')
def resnet(tmp_path_factory):
    return _mini(tmp_path_factory, RES_CFG, 'res.cfg')


def _shrink_gammas(params, prune_idx, frac, seed=0):
    """Push a fraction of gammas per prunable layer to ~0 (post-sparse-train
    state) so the global threshold has something to cut."""
    rng = np.random.RandomState(seed)
    params = {k: dict(v) for k, v in params.items()}
    for i in prune_idx:
        g = np.asarray(params[str(i)]['gamma']).copy()
        n_small = max(int(len(g) * frac), 1)
        idx = rng.choice(len(g), n_small, replace=False)
        g[idx] = rng.uniform(1e-6, 1e-4, n_small)
        params[str(i)]['gamma'] = jnp.asarray(g)
    return params


def _fwd(net, params, state, x):
    apply = make_apply(net, compute_dtype=None)
    io, _, _ = apply(params, state, x, train=False)
    return np.asarray(io)


@pytest.mark.parametrize('method', ['normal', 'shortcut', 'slim'])
def test_channel_prune_compact_equals_masked(mini, method):
    net, params, state = mini
    sets = (P.prunable_sets_normal(net) if method in ('normal', 'regular')
            else P.prunable_sets_shortcut(net))
    assert sets.prune_idx, 'mini cfg must have prunable layers'
    params2 = _shrink_gammas(params, sets.prune_idx, 0.4)

    res = channel_prune(net, params2, state, method=method, percent=0.3)
    assert res.report['params_after'] < res.report['params_before']

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, 64, 3)) * 0.3
    io_loose = _fwd(net, res.loose_params, res.loose_state, x)
    io_compact = _fwd(res.net, res.params, res.state, x)
    np.testing.assert_allclose(io_compact, io_loose, rtol=1e-3, atol=1e-4)

    # near-zero pruned gammas => compact ~= original
    io_orig = _fwd(net, params2, state, x)
    conf_err = np.abs(io_compact[..., 4] - io_orig[..., 4]).max()
    assert conf_err < 0.05, conf_err


def test_regular_prune_multiple_of_32(mini):
    net, params, state = mini
    sets = P.prunable_sets_normal(net)
    params2 = _shrink_gammas(params, sets.prune_idx, 0.5)
    res = channel_prune(net, params2, state, method='regular', percent=0.5)
    for i in sets.prune_idx:
        kept = int(res.masks[i].sum())
        ch = len(res.masks[i])
        assert kept == ch or kept % 32 == 0 or kept == 8, (i, kept)


def test_merge_mask_unifies_shortcut_chain(mini):
    net, params, state = mini
    sets = P.prunable_sets_shortcut(net)
    params2 = _shrink_gammas(params, sets.prune_idx, 0.4, seed=3)
    res = channel_prune(net, params2, state, method='slim', percent=0.4)
    # chain members (convs feeding shortcuts 3 and 5: layers 1, 2, 4)
    m1, m2, m4 = res.masks[1], res.masks[2], res.masks[4]
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(m2, m4)


def test_layer_prune_removes_blocks(resnet):
    net, params, state = resnet
    res = layer_prune(net, params, state, n_shortcuts=1)
    assert len(res.net.layers) == len(net.layers) - 3
    assert res.report['params_after'] < res.report['params_before']
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.3
    io = _fwd(res.net, res.params, res.state, x)
    assert np.isfinite(io).all()


def test_layer_prune_reindexes_routes(repo_root):
    """Route re-indexing on the real yolov3 graph (absolute 'layers' refs
    must shift by the number of removed preceding layers)."""
    net = build_ir(f'{repo_root}/cfg/yolov3/yolov3.cfg')
    params, state = init_params(jax.random.PRNGKey(0), net)
    res = layer_prune(net, params, state, n_shortcuts=3)
    assert len(res.net.layers) == len(net.layers) - 9
    routes = [l for l in res.net.layers if l.kind == 'route']
    assert routes
    for r in routes:
        for src in r.layers:
            assert 0 <= src < r.index
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 0.3
    io = _fwd(res.net, res.params, res.state, x)
    assert np.isfinite(io).all()


def test_eagle_eye_structural_search(mini):
    net, params, state = mini
    res = eagle_eye_prune(net, params, state, remain_ratio=0.6, delta=0.15,
                          candidates=1, rng=np.random.default_rng(0))
    assert 0.4 <= res.report['macs_ratio'] <= 0.8
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 0.3
    io = _fwd(res.net, res.params, res.state, x)
    assert np.isfinite(io).all()


def test_layer_channel_prune_composes(resnet):
    net, params, state = resnet
    sets = P.prunable_sets_shortcut(net)
    params2 = _shrink_gammas(params, sets.prune_idx, 0.3, seed=7)
    res = layer_channel_prune(net, params2, state, percent=0.3,
                              n_shortcuts=1)
    assert res.report['params_after'] < res.report['params_before']
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3)) * 0.3
    assert np.isfinite(_fwd(res.net, res.params, res.state, x)).all()


def test_tiny_normal_prune_real_cfg(repo_root):
    """normal prune on the real yolov3-tiny graph (maxpool topology)."""
    net = build_ir(f'{repo_root}/cfg/yolov3tiny/yolov3-tiny.cfg')
    params, state = init_params(jax.random.PRNGKey(0), net)
    rng = np.random.RandomState(1)
    for k in list(state):
        n = state[k]['mean'].shape[0]
        params[k] = dict(params[k])
        params[k]['gamma'] = jnp.asarray(rng.uniform(0.5, 1.5, n).astype(np.float32))
        params[k]['beta'] = jnp.asarray(rng.randn(n).astype(np.float32) * 0.3)
    sets = P.prunable_sets_normal(net)
    params = _shrink_gammas(params, sets.prune_idx, 0.3, seed=2)
    res = channel_prune(net, params, state, method='normal', percent=0.25)
    assert res.report['params_after'] < res.report['params_before']
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 128, 128, 3)) * 0.3
    io_loose = _fwd(net, res.loose_params, res.loose_state, x)
    io_compact = _fwd(res.net, res.params, res.state, x)
    np.testing.assert_allclose(io_compact, io_loose, rtol=1e-3, atol=1e-4)


def test_write_cfg_roundtrip(mini, tmp_path):
    net, params, state = mini
    from yolo_tpu.compress.prune import write_cfg
    path = tmp_path / 'out.cfg'
    write_cfg(path, net.module_defs)
    net2 = build_ir(str(path))
    assert len(net2.layers) == len(net.layers)
    for a, b in zip(net.layers, net2.layers):
        assert a.kind == b.kind and a.filters == b.filters
