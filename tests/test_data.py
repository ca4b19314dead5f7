"""Data pipeline tests on a synthetic on-disk dataset."""

import os

import cv2
import numpy as np
import pytest

from yolo_tpu.data import (BatchLoader, DetectionDataset, LoadImages,
                           augment_hsv, letterbox, random_affine)


@pytest.fixture(scope='module')
def synth_ds(tmp_path_factory):
    """6 images with one labelled box each, reference dir-layout
    (images/ + labels/ + list txt)."""
    root = tmp_path_factory.mktemp('ds')
    (root / 'images').mkdir()
    (root / 'labels').mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        h, w = rng.choice([240, 320, 480]), rng.choice([320, 480, 640])
        img = np.full((h, w, 3), 60, np.uint8)
        cx, cy, bw, bh = 0.5, 0.5, 0.4, 0.3
        x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
        x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), -1)
        p = root / 'images' / f'im{i}.jpg'
        cv2.imwrite(str(p), img)
        (root / 'labels' / f'im{i}.txt').write_text(
            f'{i % 2} {cx} {cy} {bw} {bh}\n')
        paths.append(str(p))
    lst = root / 'train.txt'
    lst.write_text('\n'.join(paths))
    return str(lst)


def test_letterbox_shapes():
    img = np.zeros((240, 320, 3), np.uint8)
    out, ratio, (dw, dh) = letterbox(img, 416, auto=False)
    assert out.shape == (416, 416, 3)
    assert ratio[0] == ratio[1] == 416 / 320
    # auto=True minimum-rectangle keeps 32-alignment (416 - 64k)
    out2, _, _ = letterbox(img, 416, auto=True)
    assert out2.shape[0] % 32 == 0 and out2.shape[0] <= 416


def test_letterbox_no_scaleup():
    img = np.zeros((100, 100, 3), np.uint8)
    out, ratio, _ = letterbox(img, 416, auto=False, scaleup=False)
    assert ratio[0] == 1.0
    assert out.shape == (416, 416, 3)


def test_random_affine_identity_keeps_boxes():
    img = np.zeros((200, 200, 3), np.uint8)
    t = np.array([[0, 50, 50, 150, 150]], np.float32)
    img2, t2 = random_affine(img, t, degrees=0, translate=0, scale=0, shear=0)
    assert img2.shape == img.shape
    np.testing.assert_allclose(t2[:, 1:], t[:, 1:], atol=1.0)


def test_augment_hsv_preserves_dtype_shape():
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    out = augment_hsv(img.copy(), 0.01, 0.5, 0.5)
    assert out.dtype == np.uint8 and out.shape == img.shape


def test_dataset_basic(synth_ds):
    ds = DetectionDataset(synth_ds, img_size=128, batch_size=4)
    assert len(ds) == 6
    assert ds.stats['found'] == 6
    img, labels, path, shapes = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3
    assert labels.shape == (1, 5)
    assert 0 <= labels[0, 1] <= 1


def test_dataset_label_roundtrip(synth_ds):
    """Letterboxed + renormalised labels must land on the red box."""
    ds = DetectionDataset(synth_ds, img_size=128, batch_size=4)
    img, labels, _, _ = ds[0]
    h, w = img.shape[:2]
    cx, cy = labels[0, 1] * w, labels[0, 2] * h
    # the pixel at the box centre should be red (RGB order after loader)
    assert img[int(cy), int(cx), 0] > 150, img[int(cy), int(cx)]


def test_dataset_mosaic(synth_ds):
    hyp = dict(degrees=0, translate=0, scale=0, shear=0, hsv_h=0, hsv_s=0,
               hsv_v=0)
    ds = DetectionDataset(synth_ds, img_size=128, batch_size=4, augment=True,
                          hyp=hyp, seed=0)
    assert ds.mosaic
    img, labels, _, _ = ds[0]
    assert img.shape[:2] == (128, 128)  # mosaic + border crop back to s
    assert labels.shape[1] == 5


def test_rect_batching(synth_ds):
    ds = DetectionDataset(synth_ds, img_size=128, batch_size=2, rect=True)
    assert hasattr(ds, 'batch_shapes')
    assert (ds.batch_shapes % 32 == 0).all()
    img, _, _, _ = ds[0]
    assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0


def test_batch_loader(synth_ds):
    ds = DetectionDataset(synth_ds, img_size=128, batch_size=4)
    loader = BatchLoader(ds, batch_size=4, max_targets=16)
    batches = list(loader)
    assert len(batches) == 2
    imgs, tgt, valid, paths, shapes = batches[0]
    assert imgs.shape == (4, 128, 128, 3)
    assert tgt.shape == (16, 6) and valid.shape == (16,)
    assert valid.sum() == 4  # one label per image
    # image indices in targets match batch positions
    assert set(tgt[valid][:, 0].astype(int)) == {0, 1, 2, 3}


def test_subset_len(synth_ds):
    ds = DetectionDataset(synth_ds, img_size=128, subset_len=3, seed=1)
    assert len(ds) == 3


def test_load_images_dir(synth_ds):
    d = os.path.join(os.path.dirname(synth_ds), 'images')
    src = LoadImages(d, img_size=128)
    items = list(src)
    assert len(items) == 6
    path, img, img0, cap = items[0]
    assert img.shape[0] == 3  # CHW
    assert img0.ndim == 3


def test_cutout_masks_and_label_filter():
    """cutout (reference utils/datasets.py:718-763): paints grey-noise
    rectangles in place and drops labels >60% obscured."""
    import random
    from yolo_tpu.data.transforms import bbox_ioa, cutout

    # ioa math: half-overlap box
    ioa = bbox_ioa(np.array([0, 0, 10, 10], np.float32),
                   np.array([[5, 0, 15, 10], [20, 20, 30, 30]], np.float32))
    np.testing.assert_allclose(ioa, [0.5, 0.0], atol=1e-6)

    img = np.full((96, 96, 3), 200, np.uint8)
    labels = np.array([[0, 10, 10, 30, 30], [1, 60, 60, 90, 90]], np.float32)
    out = cutout(img, labels, rnd=random.Random(0))
    assert (img != 200).any()               # masks painted
    assert 0 <= len(out) <= len(labels)     # obscured labels may drop
    # unpainted pixels untouched
    assert ((img == 200).all(axis=2) | (img != 200).any(axis=2)).all()


def test_dataset_cutout_ud_flip(synth_ds):
    """cutout + ud_flip wire through DetectionDataset (both off by default,
    like the reference's disabled flags)."""
    hyp = {'degrees': 0, 'translate': 0, 'scale': 0, 'shear': 0,
           'hsv_h': 0, 'hsv_s': 0, 'hsv_v': 0}
    base = DetectionDataset(synth_ds, img_size=128, augment=True, hyp=hyp,
                            seed=0)
    assert not base.cutout and not base.ud_flip
    ds = DetectionDataset(synth_ds, img_size=128, augment=True, hyp=hyp,
                          seed=0, cutout=True, ud_flip=True)
    flipped = painted = False
    for i in range(len(ds)):
        img, labels, _, _ = ds[i]
        assert img.dtype == np.uint8 and img.shape[2] == 3
        assert (labels[:, 1:] <= 1.0 + 1e-6).all() if len(labels) else True
        b_img, b_labels, _, _ = base[i]
        if img.shape == b_img.shape and not np.array_equal(img, b_img):
            painted = True
        if len(labels) and len(labels) == len(b_labels) and \
                not np.allclose(labels[:, 2], b_labels[:, 2], atol=1e-6):
            # the 0.9 cutout gate shifts the RNG stream, so any label-y /
            # flip divergence counts; unequal counts (cutout dropped a box)
            # are divergence too
            flipped = True
        elif len(labels) != len(b_labels):
            flipped = True
    assert painted   # cutout masks landed on at least one image
    assert flipped   # the augment stream diverged (ud flip / cutout drops)


def test_ud_flip_exact_semantics(synth_ds):
    """ud-flip (reference utils/datasets.py:484-488): when the flip fires,
    the image is flipud and label y mirrors; item 0 shares an identical RNG
    stream with the no-ud dataset up to the ud draw, so the relation is
    exact. Scans seeds until both outcomes (flip / no-flip) are seen."""
    hyp = {'degrees': 0, 'translate': 0, 'scale': 0, 'shear': 0,
           'hsv_h': 0, 'hsv_s': 0, 'hsv_v': 0}
    saw_flip = saw_noflip = False
    for seed in range(8):
        base = DetectionDataset(synth_ds, img_size=128, augment=True,
                                hyp=hyp, seed=seed)
        ud = DetectionDataset(synth_ds, img_size=128, augment=True,
                              hyp=hyp, seed=seed, ud_flip=True)
        b_img, b_lab, _, _ = base[0]
        u_img, u_lab, _, _ = ud[0]
        if np.array_equal(u_img, b_img):
            saw_noflip = True
            np.testing.assert_allclose(u_lab, b_lab, atol=1e-7)
        else:
            saw_flip = True
            np.testing.assert_array_equal(u_img, np.flipud(b_img))
            np.testing.assert_allclose(u_lab[:, 2], 1 - b_lab[:, 2],
                                       atol=1e-6)
        if saw_flip and saw_noflip:
            break
    assert saw_flip and saw_noflip


def test_random_affine_keeps_gray_channel():
    """cv2.warpAffine drops the singleton channel of (H, W, 1) inputs;
    the gray-scale augment path (1-channel IR models, the reference FPGA
    flow) must stay HWC end-to-end or batches arrive 3-D at the conv."""
    import random as _random
    from yolo_tpu.data.transforms import random_affine
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 1), np.uint8)
    out, _ = random_affine(img, np.zeros((0, 5), np.float32),
                           degrees=5, translate=0.1, scale=0.1, shear=2,
                           rnd=_random.Random(0))
    assert out.ndim == 3 and out.shape[2] == 1
    # 3-channel path unchanged
    img3 = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
    out3, _ = random_affine(img3, np.zeros((0, 5), np.float32),
                            degrees=5, translate=0.1, scale=0.1, shear=2,
                            rnd=_random.Random(0))
    assert out3.shape == (64, 64, 3)

def test_gray_dataset_augment_batch_is_4d(synth_ds):
    """A gray-scale training batch stays (bs, H, W, 1) through the full
    augment path (mosaic + affine; HSV skipped for gray)."""
    from yolo_tpu.data.datasets import BatchLoader, DetectionDataset
    hyp = {'degrees': 3, 'translate': 0.05, 'scale': 0.05, 'shear': 1,
           'hsv_h': 0, 'hsv_s': 0, 'hsv_v': 0}
    ds = DetectionDataset(synth_ds, img_size=96, batch_size=2, augment=True,
                          hyp=hyp, is_gray_scale=True, seed=0)
    imgs, _, _, _, _ = next(iter(BatchLoader(ds, 2)))
    assert imgs.shape == (2, 96, 96, 1) and imgs.dtype == np.uint8


def test_rect_sharded_shapes_ignore_sidecar(synth_ds):
    """rect + process_shard must neither read nor write the full-list
    .shapes sidecar: another rank's shard can have the SAME length but
    different images, so the cache would be silently wrong. Shards compute
    their own shapes; only unsharded datasets touch the sidecar."""
    sp = synth_ds.replace('.txt', '.shapes')
    if os.path.exists(sp):
        os.remove(sp)
    ds0 = DetectionDataset(synth_ds, 320, 2, rect=True, process_shard=(0, 2))
    assert not os.path.exists(sp)          # shard never writes the cache
    # poison a sidecar with shard-length garbage; the other rank must not
    # accept it even though the length matches
    with open(sp, 'w') as f:
        f.write('\n'.join(['9999 9999'] * len(ds0.img_files)))
    ds1 = DetectionDataset(synth_ds, 320, 2, rect=True, process_shard=(1, 2))
    assert (ds1.shapes < 9999).all()       # computed from its own images
    os.remove(sp)
    # unsharded path still populates the cache
    ds = DetectionDataset(synth_ds, 320, 2, rect=True)
    assert os.path.exists(sp) and len(open(sp).read().splitlines()) == ds.n
