"""Train-step smoke + multi-device sharding tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.ir import build_ir
from yolo_tpu.models.network import init_params
from yolo_tpu.parallel import make_mesh, replicate, shard_batch
from yolo_tpu.train.loss import LossHyp, pad_targets
from yolo_tpu.train.schedules import burn_in_scalars, cosine_lf, multistep_lf
from yolo_tpu.train.trainer import init_train_state, make_train_functions

TOY_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=mish

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


@pytest.fixture(scope='module')
def toy(tmp_path_factory):
    p = tmp_path_factory.mktemp('cfg') / 'toy.cfg'
    p.write_text(TOY_CFG)
    net = build_ir(str(p))
    params, state = init_params(jax.random.PRNGKey(0), net)
    return net, params, state


def _batch(bs=8, size=64, max_t=16, nc=2, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(bs, size, size, 3).astype(np.float32)
    labels = []
    for _ in range(bs):
        lab = np.zeros((3, 5), np.float32)
        lab[:, 0] = rng.randint(0, nc, 3)
        lab[:, 1:3] = rng.uniform(0.2, 0.8, (3, 2))
        lab[:, 3:5] = rng.uniform(0.1, 0.3, (3, 2))
        labels.append(lab)
    tgt, valid = pad_targets(labels, max_t)
    return imgs, tgt, valid


def test_train_step_decreases_loss(toy):
    net, params, state = toy
    anchor_vecs = [l.anchors / l.yolo_stride for l in net.layers
                   if l.kind == 'yolo']
    hyp = LossHyp()
    grad_fn, update_fn = make_train_functions(
        net, anchor_vecs, nc=2, hyp=hyp, compute_dtype=None)
    ts = init_train_state(params, state)
    imgs, tgt, valid = _batch()
    scalars, gr, _ = burn_in_scalars(
        1000, 500, 0, lr0=0.01, momentum=0.937, weight_decay=0.0,
        epochs=100, batch_size=64)

    losses = []
    for i in range(8):
        ts, items = grad_fn(ts, jnp.asarray(imgs), jnp.asarray(tgt),
                            jnp.asarray(valid), 1.0, 1.0)
        ts = update_fn(ts, scalars)
        losses.append(float(items[3]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_bn_state_updates(toy):
    net, params, state = toy
    anchor_vecs = [l.anchors / l.yolo_stride for l in net.layers
                   if l.kind == 'yolo']
    grad_fn, _ = make_train_functions(net, anchor_vecs, nc=2, hyp=LossHyp(),
                                      compute_dtype=None)
    ts = init_train_state(params, state)
    imgs, tgt, valid = _batch(seed=1)
    ts2, _ = grad_fn(ts, jnp.asarray(imgs), jnp.asarray(tgt),
                     jnp.asarray(valid), 1.0, 1.0)
    m0 = np.asarray(state['0']['mean'])
    m1 = np.asarray(ts2.bn_state['0']['mean'])
    assert not np.allclose(m0, m1)


def test_sparse_bn_gamma_hook(toy):
    """BN-gamma L1 subgradient (prune_utils.py:130-138) pushes |gamma| down."""
    net, params, state = toy
    anchor_vecs = [l.anchors / l.yolo_stride for l in net.layers
                   if l.kind == 'yolo']
    grad_fn, update_fn = make_train_functions(
        net, anchor_vecs, nc=2, hyp=LossHyp(), compute_dtype=None,
        sparsity_s=0.1, sparse_gamma_layers=(0, 1))
    ts = init_train_state(params, state)
    imgs, tgt, valid = _batch(seed=2)
    scalars, _, _ = burn_in_scalars(1000, 500, 0, lr0=0.01, momentum=0.9,
                                    weight_decay=0.0, epochs=10, batch_size=64)
    g0 = float(jnp.abs(ts.params['0']['gamma']).sum())
    for _ in range(5):
        ts, _ = grad_fn(ts, jnp.asarray(imgs), jnp.asarray(tgt),
                        jnp.asarray(valid), 1.0, 1.0)
        ts = update_fn(ts, scalars)
    g1 = float(jnp.abs(ts.params['0']['gamma']).sum())
    assert g1 < g0


def test_multi_device_data_parallel(toy):
    """8-way DP over the virtual CPU mesh: sharded batch, replicated params."""
    net, params, state = toy
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    anchor_vecs = [l.anchors / l.yolo_stride for l in net.layers
                   if l.kind == 'yolo']
    grad_fn, update_fn = make_train_functions(
        net, anchor_vecs, nc=2, hyp=LossHyp(), compute_dtype=None)
    imgs, tgt, valid = _batch(bs=8)

    with mesh:
        # independent state per run: the step functions donate their input
        # TrainState, and replicate() may alias buffers on the same devices
        ts_r = replicate(mesh, init_train_state(params, state))
        imgs_s = shard_batch(mesh, imgs)
        ts2, items = grad_fn(ts_r, imgs_s, jnp.asarray(tgt),
                             jnp.asarray(valid), 1.0, 1.0)
        scalars, _, _ = burn_in_scalars(1000, 500, 0, lr0=0.01, momentum=0.9,
                                        weight_decay=1e-4, epochs=10,
                                        batch_size=64)
        ts3 = update_fn(ts2, scalars)
    assert np.isfinite(np.asarray(items)).all()

    # single-device result must match the 8-way sharded result
    ts2_1, items_1 = grad_fn(init_train_state(params, state),
                             jnp.asarray(imgs), jnp.asarray(tgt),
                             jnp.asarray(valid), 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(items), np.asarray(items_1),
                               rtol=1e-4)


def test_schedules():
    assert cosine_lf(0, 100) == 1.0
    assert abs(cosine_lf(100, 100) - 0.05) < 1e-9
    assert multistep_lf(0, 100) == 1.0
    assert abs(multistep_lf(55, 100) - 0.09) < 1e-9  # after 2 milestones
    s, gr, acc = burn_in_scalars(0, 1000, 0, lr0=0.01, momentum=0.937,
                                 weight_decay=5e-4, epochs=100, batch_size=16)
    assert gr == 0.0 and acc == 1
    assert float(s.lr[1]) == pytest.approx(0.1)   # bias group starts at 0.1
    assert float(s.lr[0]) == 0.0
    s, gr, acc = burn_in_scalars(10_000, 1000, 0, lr0=0.01, momentum=0.937,
                                 weight_decay=5e-4, epochs=100, batch_size=16)
    assert gr == 1.0 and acc == 4


RESIDUAL_CFG = """
[net]
width=64
height=64
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[shortcut]
from=-2
activation=linear

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[route]
layers=-1,-2

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


def test_remat_blocks_matches_baseline(tmp_path):
    """remat='blocks' (save only shortcut/route boundaries, recompute conv
    chains in backward) must be a pure scheduling change: identical loss
    items and gradients to the default path. The cfg has a shortcut and a
    multi-route so both checkpoint_name tag sites are exercised."""
    p = tmp_path / 'res.cfg'
    p.write_text(RESIDUAL_CFG)
    net = build_ir(str(p))
    params, state = init_params(jax.random.PRNGKey(0), net)
    av = [l.anchors / l.yolo_stride for l in net.layers if l.kind == 'yolo']
    imgs, tgt, valid = _batch(bs=2)
    x = jnp.asarray(imgs)
    outs = {}
    for remat in (False, 'blocks'):
        g, _ = make_train_functions(net, av, nc=2, hyp=LossHyp(),
                                    compute_dtype=None, remat=remat)
        ts = init_train_state(params, state, use_ema=False)
        ts2, items = g(ts, x, jnp.asarray(tgt), jnp.asarray(valid), 1.0, 1.0)
        outs[remat] = (np.asarray(items),
                       jax.tree_util.tree_map(np.asarray, ts2.grad_accum))
    np.testing.assert_allclose(outs['blocks'][0], outs[False][0], rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        outs['blocks'][1], outs[False][1])
