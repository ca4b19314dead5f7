"""ASFF head fusion (reference models.py:381-399 — hardcoded-dead upstream).

The reference ships cfg/yolov3/yolov3-asff.cfg whose head convs emit
na*no + nl = 258 channels, but its YOLOLayer.forward has `ASFF = False`
hardwired, so the cfg cannot run at all there (reshaping 258ch to 3*85
raises). Here the fusion engages automatically whenever a yolo block's
`from=` head maps carry the +nl channel layout.

Parity oracle: a line-by-line torch transcription of the dead branch
(sigmoid weights * 2/n from this scale's last nl channels; other scales
bilinear-resized with align_corners=False; weighted sum of the :-n
prediction channels)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_tpu.ir import build_ir
from yolo_tpu.models.network import init_params, make_apply

torch = pytest.importorskip('torch')


def _torch_asff(srcs_nchw, i):
    """Transcription of reference models.py:381-399 for scale ``i``.

    srcs_nchw: per-scale head maps (bs, na*no+n, ny_j, nx_j), torch NCHW.
    Returns the fused prediction map (bs, na*no, ny_i, nx_i)."""
    import torch.nn.functional as F
    n = len(srcs_nchw)
    p = srcs_nchw[i]
    ny, nx = p.shape[2:]
    w = torch.sigmoid(p[:, -n:]) * (2 / n)                # models.py:390
    out = srcs_nchw[i][:, :-n] * w[:, i:i + 1]            # models.py:394
    for j in range(n):
        if j != i:
            out = out + w[:, j:j + 1] * F.interpolate(
                srcs_nchw[j][:, :-n], size=[ny, nx], mode='bilinear',
                align_corners=False)                      # models.py:396-398
    return out


def _write_toy_asff_cfg(tmp_path):
    """3-scale toy net whose yolo blocks fuse head layers 1, 4, 7."""
    cfg = tmp_path / 'asff3.cfg'
    head = ('[convolutional]\nfilters=23\nsize=1\nstride=1\npad=1\n'
            'activation=linear\n')            # na*no + nl = 2*10 + 3
    down = ('[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\n'
            'stride=2\npad=1\nactivation=leaky\n')
    yolo = ('[yolo]\nfrom=1,4,7\nmask={m}\n'
            'anchors=4,4, 8,8, 16,16, 32,32, 64,64, 96,96\n'
            'classes=5\nnum=6\n')
    cfg.write_text('[net]\nwidth=16\nheight=16\nchannels=3\n'
                   + down + head + '[route]\nlayers=-2\n'
                   + down + head + '[route]\nlayers=-2\n'
                   + down + head
                   + yolo.format(m='4,5') + yolo.format(m='2,3')
                   + yolo.format(m='0,1'))
    return cfg


def test_asff_fuse_matches_torch_transcription(tmp_path):
    # hand-build the toy net so head indices in `from=` are exact
    cfg = _write_toy_asff_cfg(tmp_path)
    net = build_ir(str(cfg))
    heads = [l.index for l in net.layers if l.kind == 'yolo']
    assert heads == [8, 9, 10]
    import jax
    params, state = init_params(jax.random.PRNGKey(0), net)
    apply = make_apply(net, compute_dtype=jnp.float32)
    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    (yolo_p, _), _ = apply(params, state, jnp.asarray(x), train=True)

    # oracle raw maps: a twin cfg with the yolo blocks deleted — identical
    # layer indices/params, every conv lands in feature_out (no fusion)
    twin = tmp_path / 'plain3.cfg'
    twin.write_text(cfg.read_text().split('[yolo]')[0])
    tnet = build_ir(str(twin))
    tapply = make_apply(tnet, compute_dtype=jnp.float32)
    (_, feats), _ = tapply(params, state, jnp.asarray(x), train=True)
    raw = [feats[i] for i in (1, 3, 5)]        # layers 1, 4, 7 (the heads)
    srcs = [torch.from_numpy(np.asarray(r, np.float32)
                             .transpose(0, 3, 1, 2)) for r in raw]
    for i, p_ours in enumerate(yolo_p):
        want_nchw = _torch_asff(srcs, i)                  # (bs,20,ny,nx)
        bs, _, ny, nx = want_nchw.shape
        want = (want_nchw.numpy().transpose(0, 2, 3, 1)
                .reshape(bs, ny, nx, 2, 10))
        got = np.asarray(p_ours, np.float32).reshape(bs, 2, ny, nx, 10) \
            .transpose(0, 2, 3, 1, 4)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_asff_cfg_runs_end_to_end():
    """The reference's own yolov3-asff.cfg (unrunnable upstream) builds,
    trains and evals here; eval io covers all three fused scales."""
    net = build_ir('cfg/yolov3/yolov3-asff.cfg')
    ylayers = [l for l in net.layers if l.kind == 'yolo']
    assert all(len(l.layers) == 3 for l in ylayers)
    import jax
    params, state = init_params(jax.random.PRNGKey(1), net)
    apply = make_apply(net, compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    io, yolo_p, _ = apply(params, state, x, train=False)
    cells = sum((64 // l.yolo_stride) ** 2 * l.na for l in ylayers)
    assert io.shape == (1, cells, 85)
    assert np.isfinite(np.asarray(io)).all()
    (tp, _), _ = apply(params, state, x, train=True)
    assert [p.shape[-1] for p in tp] == [85, 85, 85]


def test_asff_sparse_infer_matches_dense(tmp_path):
    """The sparse-decode NMS pipeline (the TPU serving default) handles
    fused ASFF heads: heads_only returns the fused maps, and the row-mode
    candidate ranker reads the obj logit from the fused layout — output
    must equal the dense io pipeline."""
    from yolo_tpu.runtime import load_model

    bundle = load_model(str(_write_toy_asff_cfg(tmp_path)))
    x = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    dense_fn = bundle.make_infer(conf_thres=0.2, max_det=16, sparse=False)
    sparse_fn = bundle.make_infer(conf_thres=0.2, max_det=16, sparse=True)
    d, s = np.asarray(dense_fn(x)), np.asarray(sparse_fn(x))
    assert d.shape == s.shape == (2, 16, 6)
    np.testing.assert_allclose(s, d, rtol=1e-4, atol=1e-4)


def test_asff_loss_gradients_reach_every_head(tmp_path):
    """compute_loss on ANY single fused scale back-propagates into ALL
    three head convs (each scale's map is a weighted sum of every head) —
    the property that makes the ASFF cfg trainable."""
    import jax
    from yolo_tpu.train.loss import LossHyp, compute_loss

    net = build_ir(str(_write_toy_asff_cfg(tmp_path)))
    ylayers = [l for l in net.layers if l.kind == 'yolo']
    anchor_vecs = [l.anchors / l.yolo_stride for l in ylayers]
    params, state = init_params(jax.random.PRNGKey(2), net)
    apply = make_apply(net, compute_dtype=jnp.float32)

    x = jnp.asarray(np.random.RandomState(2).rand(2, 16, 16, 3), jnp.float32)
    targets = jnp.asarray([[0, 1, .5, .5, .4, .4], [1, 3, .25, .75, .2, .3]],
                          jnp.float32)
    valid = jnp.ones((2,), bool)
    hyp = LossHyp()

    def loss_of(p, scale):
        (yolo_p, _), _ = apply(p, state, x, train=True)
        loss, _ = compute_loss([yolo_p[scale]], targets, valid,
                               [anchor_vecs[scale]], 5, hyp)
        return loss

    head_idx = ('1', '4', '7')
    for scale in range(3):
        grads = jax.grad(loss_of)(params, scale)
        assert all(np.isfinite(v).all()
                   for v in jax.tree_util.tree_leaves(grads))
        for h in head_idx:
            g = np.abs(np.asarray(grads[h]['w'])).max()
            assert g > 0, f'scale {scale}: no gradient into head conv {h}'
