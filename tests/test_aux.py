"""Aux subsystem tests: anchors, evolution, legacy quantizers, TTA, plots,
checkpointing, profiling."""

import io
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_tpu.compress import quant_legacy as QL
from yolo_tpu.train.evolve import (HYP_KEYS, mutate_hyp, print_mutation,
                                   plot_evolution_results)
from yolo_tpu.utils.checkpoint import (load_checkpoint, save_checkpoint,
                                       strip_optimizer)


def test_kmean_anchors(tmp_path):
    import cv2
    (tmp_path / 'images').mkdir()
    (tmp_path / 'labels').mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = np.zeros((200, 300, 3), np.uint8)
        p = tmp_path / 'images' / f'i{i}.jpg'
        cv2.imwrite(str(p), img)
        rows = []
        for _ in range(5):
            w, h = rng.uniform(0.05, 0.5, 2)
            rows.append(f'0 0.5 0.5 {w} {h}')
        (tmp_path / 'labels' / f'i{i}.txt').write_text('\n'.join(rows))
        paths.append(str(p))
    lst = tmp_path / 'train.txt'
    lst.write_text('\n'.join(paths))

    from yolo_tpu.utils.anchors import kmean_anchors
    k = kmean_anchors(str(lst), n=4, img_size=(320, 320), gen=50,
                      verbose=False, rng=np.random.default_rng(0))
    assert k.shape == (4, 2)
    assert (k > 0).all()
    areas = k.prod(1)
    assert (np.diff(areas) >= 0).all()  # sorted small->large


def test_evolution_cycle(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from yolo_tpu.config import DEFAULT_HYP
    hyp = dict(DEFAULT_HYP)
    results = (0.5, 0.5, 0.3, 0.4, 1.0, 2.0, 0.5)
    print_mutation(hyp, results)
    assert os.path.exists('evolve.txt')
    hyp2 = mutate_hyp(hyp, rng=np.random.default_rng(0))
    assert set(HYP_KEYS) <= set(hyp2)
    assert 1e-5 <= hyp2['lr0'] <= 1e-2
    # second generation uses the recorded parent
    print_mutation(hyp2, (0.6, 0.6, 0.5, 0.5, 1.0, 1.0, 0.5))
    rows = np.loadtxt('evolve.txt', ndmin=2)
    assert rows.shape[0] == 2
    assert plot_evolution_results(hyp2) == 'evolve.png'


def test_dorefa_weight_range():
    w = jnp.asarray(np.random.RandomState(0).randn(4, 4).astype(np.float32))
    q = np.asarray(QL.dorefa_weight(w, 4))
    assert q.min() >= -1 and q.max() <= 1
    levels = np.unique(np.round((q + 1) / 2 * 15, 5))
    assert len(levels) <= 16
    # STE gradient passes through
    g = jax.grad(lambda w: jnp.sum(QL.dorefa_weight(w, 4)))(w)
    assert np.isfinite(np.asarray(g)).all()


def test_dorefa_activation():
    x = jnp.asarray(np.linspace(-1, 2, 50, dtype=np.float32))
    q = np.asarray(QL.dorefa_activation(x, 2))
    assert q.min() >= 0 and q.max() <= 1
    assert len(np.unique(q)) <= 4


def test_binary_ternary():
    w = jnp.asarray(np.random.RandomState(1).randn(32).astype(np.float32))
    b = np.asarray(QL.binary_weight(w))
    assert set(np.unique(b)) <= {-1.0, 1.0}
    bw = np.asarray(QL.bwn_weight(w))
    assert len(np.unique(np.round(np.abs(bw), 5))) == 1
    t = np.asarray(QL.ternary_weight(w))
    assert len(np.unique(t)) <= 3


def test_minmax_ptq():
    x = jnp.asarray(np.random.RandomState(2).randn(1000).astype(np.float32))
    y = np.asarray(QL.minmax_ptq(x, 8))
    assert np.abs(y - np.asarray(x)).max() < 0.05


def test_tta_augmented_apply(repo_root):
    from yolo_tpu.ir import build_ir
    from yolo_tpu.models.network import (init_params, make_apply,
                                         make_augmented_apply)
    net = build_ir(f'{repo_root}/cfg/yolov3tiny/yolov3-tiny.cfg')
    params, state = init_params(jax.random.PRNGKey(0), net)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3)) * 0.2 + 0.5
    aug = make_augmented_apply(net, compute_dtype=None)
    io = aug(params, state, x)
    base, _, _ = make_apply(net, compute_dtype=None)(params, state, x, False)
    assert io.shape[1] > base.shape[1]   # three merged views
    assert np.isfinite(np.asarray(io)).all()


def test_checkpoint_roundtrip(tmp_path):
    params = {'0': {'w': np.arange(12, dtype=np.float32).reshape(3, 4)}}
    state = {'0': {'mean': np.zeros(4, np.float32)}}
    opt_state = {'m': {'0': {'w': np.ones((3, 4), np.float32)}}}
    path = tmp_path / 'ck.npz'
    save_checkpoint(path, params=params, state=state, epoch=7,
                    best_fitness=0.5, training_results='hello',
                    opt_state=opt_state)
    ck = load_checkpoint(path)
    np.testing.assert_array_equal(ck['params']['0']['w'], params['0']['w'])
    assert ck['epoch'] == 7 and ck['best_fitness'] == 0.5
    assert ck['training_results'] == 'hello'
    assert 'opt_state' in ck
    strip_optimizer(path)
    ck2 = load_checkpoint(path)
    assert 'opt_state' not in ck2


def test_plot_images(tmp_path):
    from yolo_tpu.utils.plots import plot_images
    imgs = np.random.RandomState(0).randint(0, 255, (4, 64, 64, 3), np.uint8)
    targets = np.array([[0, 1, 0.5, 0.5, 0.3, 0.3],
                        [2, 0, 0.4, 0.6, 0.2, 0.2]], np.float32)
    out = plot_images(imgs, targets, fname=str(tmp_path / 'm.jpg'),
                      names=['a', 'b'])
    assert out.ndim == 3 and os.path.exists(tmp_path / 'm.jpg')


class _FakeResponse(io.BytesIO):
    """File-like HTTP response with headers, usable as a context manager."""

    def __init__(self, payload: bytes, ctype='application/octet-stream'):
        super().__init__(payload)
        self.headers = {'Content-Type': ctype}

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeOpener:
    """Scripted urllib-opener stand-in: url-substring -> response factory."""

    def __init__(self, routes):
        self.routes = routes
        self.calls = []

    def open(self, url, timeout=None):
        self.calls.append(url)
        for frag, make in self.routes:
            if frag in url:
                return make()
        raise OSError(f'no route for {url}')


def test_attempt_download_local_passthrough(tmp_path):
    from yolo_tpu.utils.downloads import attempt_download
    f = tmp_path / 'x.weights'
    f.write_bytes(b'123')
    assert attempt_download(str(f)) == str(f)
    assert attempt_download('') == ''


def test_attempt_download_gdrive_small(tmp_path, capsys):
    """Known checkpoint names resolve via their Drive ids
    (models.py:822-830); a direct (non-HTML) first response IS the file."""
    from yolo_tpu.utils import downloads as D
    blob = b'w' * 1_100_000
    op = _FakeOpener([('drive.google.com', lambda: _FakeResponse(blob))])
    dest = tmp_path / 'yolov3.weights'
    assert D.attempt_download(str(dest), opener=op) == str(dest)
    assert dest.read_bytes() == blob
    assert D.GDRIVE_IDS['yolov3.weights'] in op.calls[0]


def test_attempt_download_gdrive_confirm_token(tmp_path):
    """Large files answer with a virus-scan interstitial carrying a confirm
    token; the second GET must echo it (google_utils.py:23-27 cookie+awk)."""
    from yolo_tpu.utils import downloads as D
    blob = b'W' * 1_200_000
    html = _FakeResponse(b'<a href="...confirm=AbC123&amp;id=x">',
                         ctype='text/html')
    op = _FakeOpener([
        ('confirm=AbC123', lambda: _FakeResponse(blob)),
        ('drive.google.com', lambda: html),
    ])
    dest = tmp_path / 'yolov3-tiny.weights'
    assert D.attempt_download(str(dest), opener=op) == str(dest)
    assert dest.read_bytes() == blob
    assert any('confirm=AbC123' in u for u in op.calls)


def test_attempt_download_pjreddie(tmp_path):
    """Unknown names fall back to pjreddie.com (models.py:833-836)."""
    from yolo_tpu.utils import downloads as D
    blob = b'p' * 1_050_000
    op = _FakeOpener([('pjreddie.com/media/files/custom.weights',
                       lambda: _FakeResponse(blob))])
    dest = tmp_path / 'custom.weights'
    assert D.attempt_download(str(dest), opener=op) == str(dest)
    assert dest.read_bytes() == blob


def test_attempt_download_rejects_partial(tmp_path):
    """Undersized (<1 MB) results are removed and raised on with the
    canonical mirror message (models.py:839-843)."""
    from yolo_tpu.utils import downloads as D
    op = _FakeOpener([('drive.google.com', lambda: _FakeResponse(b'tiny'))])
    dest = tmp_path / 'yolov3.weights'
    with pytest.raises(FileNotFoundError, match='drive.google.com'):
        D.attempt_download(str(dest), opener=op)
    assert not dest.exists()
    op2 = _FakeOpener([])   # network down: same guidance failure
    with pytest.raises(FileNotFoundError, match='pjreddie.com'):
        D.attempt_download(str(tmp_path / 'other.weights'), opener=op2)


def test_fpga_reorder_shapes():
    from yolo_tpu.compress.fpga_export import (reorder_activations,
                                               reorder_weights)
    w = np.arange(64 * 64 * 9).reshape(64, 64, 3, 3).astype(np.int8)
    r = reorder_weights(w, TM=32, TN=32)
    assert r.size == w.size
    # first-layer path zero-pads Cin to TN
    w3 = np.ones((32, 3, 3, 3), np.int8)
    r3 = reorder_weights(w3, TM=32, TN=32)
    assert r3.size == 32 * 32 * 9
    a = np.arange(64 * 4 * 4).reshape(64, 4, 4).astype(np.int8)
    ra = reorder_activations(a, TN=32)
    assert ra.size == a.size


def test_coco_to_darknet_converter(tmp_path):
    """scripts/coco_to_darknet.py: contiguous ids, clipping, crowd/degenerate
    filtering, loader-compatible images->labels layout (ref data/get_coco2017.sh
    label pack equivalent)."""
    import json
    import subprocess
    import sys
    import cv2
    img_dir = tmp_path / 'images' / 'val2017'
    img_dir.mkdir(parents=True)
    for fn in ('a.jpg', 'b.jpg'):
        cv2.imwrite(str(img_dir / fn), np.zeros((100, 200, 3), np.uint8))
    coco = {
        'images': [{'id': 1, 'file_name': 'a.jpg', 'width': 200, 'height': 100},
                   {'id': 2, 'file_name': 'b.jpg', 'width': 200, 'height': 100}],
        'categories': [{'id': 1}, {'id': 3}, {'id': 90}],
        'annotations': [
            {'image_id': 1, 'category_id': 3, 'bbox': [50, 25, 100, 50], 'iscrowd': 0},
            {'image_id': 1, 'category_id': 90, 'bbox': [-5, -5, 20, 20], 'iscrowd': 0},
            {'image_id': 1, 'category_id': 1, 'bbox': [0, 0, 0.5, 30], 'iscrowd': 0},
            {'image_id': 2, 'category_id': 1, 'bbox': [10, 10, 40, 40], 'iscrowd': 1}],
    }
    ann = tmp_path / 'inst.json'
    ann.write_text(json.dumps(coco))
    script = os.path.join(os.path.dirname(__file__), '..', 'scripts',
                          'coco_to_darknet.py')
    subprocess.run([sys.executable, script, '--ann', str(ann),
                    '--images', str(img_dir), '--out', str(tmp_path),
                    '--list', str(tmp_path / 'val.txt')], check=True)
    rows = (tmp_path / 'labels' / 'val2017' / 'a.txt').read_text().strip().split('\n')
    assert len(rows) == 2  # degenerate 0.5px box dropped
    vals = [float(v) for v in rows[0].split()]
    assert vals == [1, 0.5, 0.5, 0.5, 0.5]        # category id 3 -> class 1
    assert rows[1].split()[0] == '2'              # id 90 -> contiguous 2
    x, y, w, h = (float(v) for v in rows[1].split()[1:])
    assert x - w / 2 >= 0 and y - h / 2 >= 0      # clipped into the image
    assert not (tmp_path / 'labels' / 'val2017' / 'b.txt').exists()  # crowd-only
    listed = (tmp_path / 'val.txt').read_text().split()
    assert len(listed) == 2
    # loader layout contract: images->labels path substitution
    assert listed[0].replace('images', 'labels') \
        .replace('.jpg', '.txt').endswith('labels/val2017/a.txt')


def test_gsutil_sync_commands(monkeypatch):
    """gsutil wrappers issue the reference's exact transfers
    (train.py:527-528, 669-670; utils/utils.py:1073-1075) via an
    injectable runner — mock-tested, no GCS needed."""
    from yolo_tpu.utils import gsutil
    calls = []
    monkeypatch.setattr(gsutil, 'runner', lambda cmd: calls.append(cmd) or 0)
    gsutil.sync_results('bkt', 'run1', 'res.txt')
    gsutil.download_evolve('bkt')
    gsutil.upload_evolve('bkt')
    gsutil.upload_weights('bkt', 'weights/best.npz')
    gsutil.sync_results('', 'run1')        # no bucket -> no call
    gsutil.sync_results('bkt', '')         # no name -> no call
    assert calls == [
        ['gsutil', 'cp', 'res.txt', 'gs://bkt/results/resultsrun1.txt'],
        ['gsutil', 'cp', 'gs://bkt/evolve.txt', 'evolve.txt'],
        ['gsutil', 'cp', 'evolve.txt', 'gs://bkt/evolve.txt'],
        ['gsutil', 'cp', 'weights/best.npz', 'gs://bkt/weights/best.npz'],
    ]


def test_gsutil_runner_survives_missing_binary(tmp_path):
    """The default runner degrades to a log line when gsutil is absent
    (zero-egress dev boxes) instead of raising."""
    from yolo_tpu.utils import gsutil
    rc = gsutil._run(['gsutil-definitely-not-installed', 'cp', 'a', 'b'])
    assert rc != 0


def test_dev_utilities(tmp_path, monkeypatch, capsys):
    """The reference's REPL-only dev utilities (utils/utils.py:868-977,
    1078-1108, 1262-1339) exist and work on this repo's artifacts."""
    from yolo_tpu.utils import dev
    from yolo_tpu.ir import build_ir
    from yolo_tpu.models.network import init_params

    monkeypatch.chdir(tmp_path)

    # label-dir tools on a tiny synthetic darknet label set
    (tmp_path / 'labels').mkdir()
    (tmp_path / 'images').mkdir()
    import cv2
    rows = {'a': [[0, .5, .5, .2, .2], [0, .3, .3, .1, .1]],
            'b': [[2, .5, .5, .2, .2]],
            'c': [[0, .4, .4, .2, .2], [2, .6, .6, .1, .1]]}
    for name, rr in rows.items():
        (tmp_path / 'labels' / f'{name}.txt').write_text(
            '\n'.join(' '.join(str(v) for v in r) for r in rr) + '\n')
        cv2.imwrite(str(tmp_path / 'images' / f'{name}.jpg'),
                    np.zeros((64, 64, 3), np.uint8))
    counts = dev.coco_class_count(str(tmp_path / 'labels'), nc=5)
    assert counts.tolist() == [3, 0, 2, 0, 0]
    people = dev.coco_only_people(str(tmp_path / 'labels'))
    assert [(n, os.path.basename(f)) for n, f in people] == [(2, 'a.txt')]
    dev.coco_single_class_labels(str(tmp_path / 'labels'), label_class=2,
                                 out_dir=str(tmp_path / 'single'))
    kept = sorted(os.listdir(tmp_path / 'single' / 'labels'))
    assert kept == ['b.txt', 'c.txt']
    # remapped to class 0, only matching rows kept
    got = np.loadtxt(tmp_path / 'single' / 'labels' / 'c.txt').reshape(-1, 5)
    assert got[:, 0].tolist() == [0.0] and len(got) == 1

    dev.crop_images_random(str(tmp_path / 'images'), seed=0)
    img = cv2.imread(str(tmp_path / 'images' / 'a.jpg'))
    assert img is not None and img.shape[0] <= 64 and img.shape[1] <= 64

    # model bias summary on the tiny toy cfg
    cfg = tmp_path / 'toy.cfg'
    cfg.write_text(
        '[net]\nwidth=64\nheight=64\nchannels=3\n'
        '[convolutional]\nbatch_normalize=1\nfilters=8\nsize=3\nstride=2\n'
        'pad=1\nactivation=leaky\n'
        '[convolutional]\nbatch_normalize=0\nfilters=18\nsize=1\nstride=1\n'
        'pad=1\nactivation=linear\n'
        '[yolo]\nmask=0,1,2\nanchors=10,13, 16,30, 33,23\nclasses=1\nnum=3\n')
    net = build_ir(str(cfg))
    params, state = init_params(jax.random.PRNGKey(0), net)
    dev.print_model_biases(net, params)
    out = capsys.readouterr().out
    assert 'Model Bias Summary' in out and '+/-' in out

    # create_backbone: strips optimizer/results, resets epoch
    from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    save_checkpoint(str(tmp_path / 'last.npz'), params=params, state=state,
                    epoch=7, best_fitness=0.5, training_results='x',
                    opt_state={'momentum_buf': params})
    dev.create_backbone(str(tmp_path / 'last.npz'),
                        str(tmp_path / 'backbone.npz'))
    bk = load_checkpoint(str(tmp_path / 'backbone.npz'))
    assert int(bk['epoch']) == -1 and 'opt_state' not in bk

    # select_best_evolve
    (tmp_path / 'evolve.txt').write_text(
        ' '.join(['0.1'] * 12) + '\n' + ' '.join(['0.9'] * 12) + '\n')
    best = dev.select_best_evolve(str(tmp_path / 'evolve*.txt'),
                                  log=lambda *a: None)
    assert len(best) == 1 and best[0][1][0] == np.float32(0.9)

    # apply_classifier keeps only detections the 2nd stage agrees with
    dets = [np.array([[2, 2, 20, 20, 0.9, 0],
                      [30, 30, 60, 60, 0.8, 1]], np.float32)]
    im0 = np.zeros((64, 64, 3), np.uint8)
    keep0 = dev.apply_classifier(dets, lambda b: np.zeros(len(b), int),
                                 (64, 64), [im0])
    assert len(keep0[0]) == 1 and keep0[0][0, 5] == 0

    # plot functions write their artifacts
    assert os.path.exists(dev.plot_wh_methods(str(tmp_path / 'cmp.png')))
    np.savetxt(tmp_path / 'test.txt',
               np.random.RandomState(0).rand(50, 4) * 64)
    dev.plot_test_txt(str(tmp_path / 'test.txt'))
    assert os.path.exists('hist2d.png') and os.path.exists('hist1d.png')
    np.savetxt(tmp_path / 'targets.txt',
               np.random.RandomState(1).rand(50, 4))
    assert os.path.exists(dev.plot_targets_txt(str(tmp_path / 'targets.txt'),
                                               str(tmp_path / 'tg.jpg')))
    res = np.zeros((3, 12)); res[:, 0] = np.arange(3); res[:, 1:] = 0.5
    np.savetxt(tmp_path / 'results.txt', res, fmt='%10.4g')
    saved = dev.plot_results_overlay(pattern=str(tmp_path / 'results*.txt'))
    assert saved and os.path.exists(saved[0])
