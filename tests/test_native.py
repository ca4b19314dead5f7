"""Native C++ fastpre library tests (fallback-aware)."""

import numpy as np
import pytest

from yolo_tpu import native
from yolo_tpu.data.transforms import letterbox

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native fastpre not built')


def test_letterbox_batch_matches_cv2():
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 255, (h, w, 3), np.uint8)
            for h, w in [(240, 320), (480, 360), (100, 500)]]
    dst, ratios, pads = native.letterbox_batch(imgs, 416, 416, scaleup=True)
    assert dst.shape == (3, 416, 416, 3)
    for i, im in enumerate(imgs):
        ref, (rw, rh), (dw, dh) = letterbox(im, 416, auto=False, scaleup=True)
        ref = ref[:, :, ::-1]  # loader converts BGR->RGB; native does too
        assert abs(ratios[i] - rw) < 1e-6
        assert abs(pads[i, 0] - dw) < 0.51 and abs(pads[i, 1] - dh) < 0.51
        # bilinear implementations agree within rounding on the content area
        diff = np.abs(dst[i].astype(int) - ref.astype(int))
        assert np.median(diff) <= 1
        assert (diff <= 2).mean() > 0.95, (diff <= 2).mean()


def test_letterbox_no_scaleup():
    img = np.full((100, 100, 3), 7, np.uint8)
    dst, ratios, _ = native.letterbox_batch([img], 416, 416, scaleup=False)
    assert ratios[0] == 1.0
    # padding value fills the border
    assert dst[0, 0, 0, 0] == 114
    center = dst[0, 208, 208]
    assert (center == 7).all()


def test_normalize_batch():
    x = np.random.RandomState(1).randint(0, 255, (2, 8, 8, 3), np.uint8)
    y = native.normalize_batch(x)
    np.testing.assert_allclose(y, x.astype(np.float32) / 256.0, atol=1e-7)
    y2 = native.normalize_batch(x, maxabs=True)
    np.testing.assert_allclose(y2, x.astype(np.float32) / 256.0 * 2 - 1,
                               atol=1e-6)


def test_threads_reported():
    assert native.num_threads() >= 1


def test_batch_loader_native_parity(tmp_path):
    """Native-assembled eval batches must match the python path: identical
    labels/shapes, near-identical pixels."""
    import cv2
    from yolo_tpu.data.datasets import BatchLoader, DetectionDataset
    (tmp_path / 'images').mkdir()
    (tmp_path / 'labels').mkdir()
    rng = np.random.RandomState(0)
    paths = []
    for i in range(4):
        img = rng.randint(0, 255, (rng.choice([200, 300]),
                                   rng.choice([250, 400]), 3), np.uint8)
        p = tmp_path / 'images' / f'i{i}.jpg'
        cv2.imwrite(str(p), img)
        (tmp_path / 'labels' / f'i{i}.txt').write_text('0 0.5 0.5 0.4 0.4\n')
        paths.append(str(p))
    lst = tmp_path / 'val.txt'
    lst.write_text('\n'.join(paths))

    ds = DetectionDataset(str(lst), img_size=128, batch_size=4, rect=True)
    nat = list(BatchLoader(ds, 4, max_targets=16, use_native=True))
    py = list(BatchLoader(ds, 4, max_targets=16, use_native=False))
    (bi, ti, vi, pi, si), (bp, tp, vp, pp, sp) = nat[0], py[0]
    assert bi.shape == bp.shape
    np.testing.assert_array_equal(vi, vp)
    np.testing.assert_allclose(ti, tp, atol=1e-5)
    assert pi == pp
    diff = np.abs(bi.astype(int) - bp.astype(int))
    assert np.median(diff) <= 1
    for a, b in zip(si, sp):
        assert (a is None) == (b is None)
        if a is not None:
            assert a[0] == b[0]
