"""Dataset loaders feeding fixed-shape NHWC batches to the TPU.

Re-designs the reference data layer (utils/datasets.py:43-508) around a
host-side numpy pipeline + background prefetch thread instead of torch
DataLoader worker processes:

- LoadImages / LoadWebcam / LoadStreams: inference sources (dir/file/video/
  webcam/multi-RTSP), API-compatible iteration contract.
- DetectionDataset: training/eval dataset — image-list txt, label-txt caching
  with the reference's validation asserts, optional RAM cache, rectangular
  batching by aspect ratio (per-batch shapes /32), subset sampling for PTQ
  calibration, image-weighted resampling hooks, mosaic + affine + HSV + flips.
- BatchLoader: assembles fixed-shape batches (imgs uint8 NHWC, padded target
  tensor + mask) with a double-buffered prefetch thread so the accelerator
  never waits on the host.
"""

from __future__ import annotations

import glob
import math
import os
import queue
import random
import threading
import time
from pathlib import Path

import cv2
import numpy as np

from .transforms import (PAD_VALUE, augment_hsv, cutout, letterbox,
                         random_affine, resize_to, xywhn_to_xyxy_pixels,
                         xyxy2xywh_np)

IMG_FORMATS = ['.bmp', '.jpg', '.jpeg', '.png', '.tif', '.dng']
VID_FORMATS = ['.mov', '.avi', '.mp4']


def _read_image(path: str, is_gray_scale: bool = False) -> np.ndarray:
    if is_gray_scale:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        img = None if img is None else img[..., None]
    else:
        img = cv2.imread(path)  # BGR, matches reference convention
    assert img is not None, f'Image Not Found {path}'
    return img


class LoadImages:
    """Directory/file image+video source (reference utils/datasets.py:43-124).

    Iterates (path, letterboxed_img_chw_rgb, original_img, video_capture)."""

    def __init__(self, path, img_size=416, is_gray_scale=False, rect=False):
        # rect=False letterboxes to the full square (reference
        # utils/datasets.py:107-110 default) — one static shape, so the
        # jitted pipeline compiles once; rect=True pads to the minimal
        # 64-multiple rectangle (reference --rect)
        self.rect = rect
        path = str(Path(path))
        files = []
        if os.path.isdir(path):
            files = sorted(glob.glob(os.path.join(path, '*.*')))
        elif os.path.isfile(path):
            files = [path]
        images = [f for f in files if os.path.splitext(f)[-1].lower() in IMG_FORMATS]
        videos = [f for f in files if os.path.splitext(f)[-1].lower() in VID_FORMATS]
        self.img_size = img_size
        self.files = images + videos
        self.n_images = len(images)
        self.video_flag = [False] * len(images) + [True] * len(videos)
        self.mode = 'images'
        self.is_gray_scale = is_gray_scale
        self.cap = None
        if videos:
            self._new_video(videos[0])
        assert self.files, f'No images or videos found in {path}'

    def __iter__(self):
        self.count = 0
        return self

    def __len__(self):
        return len(self.files)

    def _new_video(self, path):
        self.frame = 0
        self.cap = cv2.VideoCapture(path)
        self.nframes = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __next__(self):
        if self.count == len(self.files):
            raise StopIteration
        path = self.files[self.count]
        if self.video_flag[self.count]:
            self.mode = 'video'
            ok, img0 = self.cap.read()
            if not ok:
                self.count += 1
                self.cap.release()
                if self.count == len(self.files):
                    raise StopIteration
                path = self.files[self.count]
                self._new_video(path)
                ok, img0 = self.cap.read()
            self.frame += 1
        else:
            self.count += 1
            img0 = _read_image(path, self.is_gray_scale)
        img = letterbox(img0, new_shape=self.img_size, auto=self.rect,
                        is_gray_scale=self.is_gray_scale)[0]
        if not self.is_gray_scale:
            img = img[:, :, ::-1]  # BGR -> RGB
        img = np.ascontiguousarray(img.transpose(2, 0, 1))
        return path, img, img0, self.cap


class LoadWebcam:
    """Webcam source (reference utils/datasets.py:127-189)."""

    def __init__(self, pipe=0, img_size=416):
        self.img_size = img_size
        self.pipe = pipe
        self.cap = cv2.VideoCapture(pipe)
        self.cap.set(cv2.CAP_PROP_BUFFERSIZE, 3)
        self.mode = 'webcam'

    def __iter__(self):
        self.count = -1
        return self

    def __len__(self):
        return 0

    def __next__(self):
        self.count += 1
        if cv2.waitKey(1) == ord('q'):
            self.cap.release()
            cv2.destroyAllWindows()
            raise StopIteration
        ok, img0 = self.cap.read()
        assert ok, f'Camera Error {self.pipe}'
        if self.pipe == 0:
            img0 = cv2.flip(img0, 1)  # mirror local webcam
        img = letterbox(img0, new_shape=self.img_size)[0]
        img = np.ascontiguousarray(img[:, :, ::-1].transpose(2, 0, 1))
        return 'webcam.jpg', img, img0, None


class LoadStreams:
    """Multi-RTSP/HTTP stream source with one daemon reader thread per stream
    reading every 4th frame (reference utils/datasets.py:192-262)."""

    def __init__(self, sources='streams.txt', img_size=416):
        self.mode = 'images'
        self.img_size = img_size
        if str(sources).endswith('.txt') and os.path.isfile(sources):
            # a .txt lists one stream URL per line (reference
            # utils/datasets.py:196-204); any other path/URL is one source
            sources = [x.strip() for x in open(sources).read().splitlines()
                       if x.strip()]
        else:
            sources = [sources]
        self.sources = sources
        self.imgs = [None] * len(sources)
        for i, s in enumerate(sources):
            cap = cv2.VideoCapture(0 if s == '0' else s)
            assert cap.isOpened(), f'Failed to open {s}'
            _, self.imgs[i] = cap.read()
            t = threading.Thread(target=self._update, args=(i, cap), daemon=True)
            t.start()
        # letterbox all to a common auto-rect only if shapes agree
        shapes = [letterbox(x, new_shape=self.img_size)[0].shape
                  for x in self.imgs]
        self.rect = len(set(shapes)) == 1

    def _update(self, i, cap):
        n = 0
        while cap.isOpened():
            n += 1
            if not cap.grab():
                break    # EOF (file source) or stream closed: keep the
                         # last good frame, stop the reader thread
            if n == 4:  # decode every 4th frame
                ok, frame = cap.retrieve()
                if ok:   # keep the last good frame on decode dropouts
                    self.imgs[i] = frame
                n = 0
            time.sleep(0.01)

    def __iter__(self):
        self.count = -1
        return self

    def __len__(self):
        return 0

    def __next__(self):
        self.count += 1
        img0 = [x.copy() for x in self.imgs]
        if cv2.waitKey(1) == ord('q'):
            cv2.destroyAllWindows()
            raise StopIteration
        img = [letterbox(x, new_shape=self.img_size, auto=self.rect)[0]
               for x in img0]
        img = np.stack(img, 0)[:, :, :, ::-1].transpose(0, 3, 1, 2)
        return self.sources, np.ascontiguousarray(img), img0, None


class DetectionDataset:
    """Training/eval dataset (reference LoadImagesAndLabels,
    utils/datasets.py:265-508)."""

    def __init__(self, path, img_size=416, batch_size=16, augment=False,
                 hyp=None, rect=False, image_weights=False,
                 cache_images=False, is_gray_scale=False, subset_len=-1,
                 seed=None, process_shard=None, cutout=False,
                 ud_flip=False):
        path = str(Path(path))
        assert os.path.isfile(path), f'File not found {path}'
        with open(path) as f:
            self.img_files = [x for x in f.read().splitlines()
                              if os.path.splitext(x)[-1].lower() in IMG_FORMATS]
        self.rnd = random.Random(seed)
        self._real = None   # process_shard wrap-pad mask (all real otherwise)
        if process_shard is not None:
            # per-host partition (replaces DistributedSampler, reference
            # train.py:267-280): host i takes every pc-th item, then pads to
            # the common ceil length by wrapping (torch DistributedSampler
            # semantics) so every host sees the same batch count WITHOUT
            # dropping the tail images. Wrapped duplicates report an empty
            # path (path_of), so the collective evaluator excludes them from
            # its statistics while SPMD lockstep is preserved.
            pi, pc = process_shard
            files = self.img_files[pi::pc]
            assert files, (len(self.img_files), pc)
            n_pad = -(-len(self.img_files) // pc) - len(files)
            self._real = [True] * len(files) + [False] * n_pad
            files = files + [files[j % len(files)] for j in range(n_pad)]
            self.img_files = files
        if subset_len != -1:
            assert subset_len <= len(self.img_files)
            # sample indices (same draws as sampling the list itself) so the
            # shard-pad mask stays aligned with the kept files
            keep = self.rnd.sample(range(len(self.img_files)), subset_len)
            self.img_files = [self.img_files[i] for i in keep]
            if self._real is not None:
                self._real = [self._real[i] for i in keep]
        n = len(self.img_files)
        assert n > 0, f'No images found in {path}'
        bi = np.floor(np.arange(n) / batch_size).astype(int)

        self.n = n
        self.batch = bi
        self.img_size = img_size
        self.augment = augment
        self.hyp = hyp or {}
        self.image_weights = image_weights
        self.rect = False if image_weights else rect
        self.mosaic = self.augment and not self.rect
        self.is_gray_scale = is_gray_scale
        # extra augmentations, disabled by default like the reference
        # (cutout: utils/datasets.py:718-763 behind a commented call;
        # ud_flip: :484-488 behind `ud_flip = False`)
        self.cutout = cutout
        self.ud_flip = ud_flip
        self.indices = list(range(n))

        self.label_files = [
            x.replace('images', 'labels').replace(os.path.splitext(x)[-1], '.txt')
            for x in self.img_files]

        if self.rect:
            shapes = self._read_shapes(path)
            ar = shapes[:, 1] / shapes[:, 0]  # h/w ... shapes stored as (w, h)
            order = ar.argsort()
            self.img_files = [self.img_files[i] for i in order]
            self.label_files = [self.label_files[i] for i in order]
            if self._real is not None:
                self._real = [self._real[i] for i in order]
            self.shapes = shapes[order]
            ar = ar[order]
            nb = bi[-1] + 1
            batch_shapes = [[1, 1]] * nb
            for b in range(nb):
                ari = ar[bi == b]
                mini, maxi = ari.min(), ari.max()
                if maxi < 1:
                    batch_shapes[b] = [maxi, 1]
                elif mini > 1:
                    batch_shapes[b] = [1, 1 / mini]
            self.batch_shapes = (np.ceil(np.array(batch_shapes) * img_size / 32.)
                                 .astype(int) * 32)

        # Label cache + validation (reference utils/datasets.py:329-388)
        self.labels = [np.zeros((0, 5), np.float32)] * n
        n_missing = n_found = n_empty = n_dup = 0
        for i, lf in enumerate(self.label_files):
            try:
                with open(lf) as f:
                    lab = np.array([x.split() for x in f.read().splitlines()],
                                   dtype=np.float32)
            except (OSError, ValueError):
                n_missing += 1
                continue
            if lab.shape[0]:
                assert lab.shape[1] == 5, f'> 5 label columns: {lf}'
                assert (lab >= 0).all(), f'negative labels: {lf}'
                assert (lab[:, 1:] <= 1).all(), \
                    f'non-normalized or out of bounds coordinate labels: {lf}'
                if np.unique(lab, axis=0).shape[0] < lab.shape[0]:
                    n_dup += 1
                self.labels[i] = lab
                n_found += 1
            else:
                n_empty += 1
        self.stats = dict(found=n_found, missing=n_missing, empty=n_empty,
                          duplicate=n_dup)

        self.imgs = [None] * n
        self.img_hw0 = [None] * n
        self.img_hw = [None] * n
        if cache_images:
            for i in range(n):
                self._load_image(i)

    def path_of(self, index):
        """Image path for batch metadata — '' for shard-pad duplicates so
        downstream consumers (the evaluator's statistics pass, save_json)
        treat them like ragged-batch padding."""
        if self._real is not None and not self._real[index]:
            return ''
        return self.img_files[index]

    def _read_shapes(self, path):
        # the .shapes sidecar caches shapes for the FULL list file; a
        # process_shard holds a strided subset, so the cache must be
        # neither read (another rank's shard can have the same length)
        # nor overwritten — compute shard shapes directly
        sharded = self._real is not None
        sp = path.replace('.txt', '.shapes')
        if not sharded:
            try:
                with open(sp) as f:
                    s = [x.split() for x in f.read().splitlines()]
                assert len(s) == self.n, 'Shapefile out of sync'
                return np.array(s, np.float64)
            except (OSError, AssertionError):
                pass
        from PIL import Image
        shapes = []
        for f in self.img_files:
            with Image.open(f) as im:
                shapes.append(im.size)  # (w, h)
        s = np.array(shapes, np.float64)
        if not sharded:
            try:
                np.savetxt(sp, s, fmt='%g')
            except OSError:
                pass
        return s

    def _load_image(self, index):
        if self.imgs[index] is not None:
            return self.imgs[index], self.img_hw0[index], self.img_hw[index]
        img = _read_image(self.img_files[index], self.is_gray_scale)
        img, hw0, hw = resize_to(img, self.img_size, self.augment,
                                 self.is_gray_scale)
        self.imgs[index], self.img_hw0[index], self.img_hw[index] = img, hw0, hw
        return img, hw0, hw

    def _load_mosaic(self, index):
        """4-image mosaic (reference utils/datasets.py:553-608)."""
        s = self.img_size
        xc = int(self.rnd.uniform(s * 0.5, s * 1.5))
        yc = int(self.rnd.uniform(s * 0.5, s * 1.5))
        indices = [index] + [self.rnd.randint(0, self.n - 1) for _ in range(3)]
        labels4 = []
        img4 = None
        for i, idx in enumerate(indices):
            img, _, (h, w) = self._load_image(idx)
            if i == 0:
                img4 = np.full((s * 2, s * 2, img.shape[2]), PAD_VALUE, np.uint8)
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
                x2b, y2b = w, h
            elif i == 1:
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b = 0, h - (y2a - y1a)
                x2b, y2b = min(w, x2a - x1a), h
            elif i == 2:
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b = w - (x2a - x1a), 0
                x2b, y2b = max(xc, w), min(y2a - y1a, h)
            else:
                x1a, y1a = xc, yc
                x2a, y2a = min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b = 0, 0
                x2b, y2b = min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            lab = self.labels[idx]
            if lab.size:
                labels4.append(xywhn_to_xyxy_pixels(lab, w, h, padw, padh))
        labels4 = (np.concatenate(labels4, 0) if labels4
                   else np.zeros((0, 5), np.float32))
        if len(labels4):
            np.clip(labels4[:, 1:], 0, 2 * s, out=labels4[:, 1:])
        img4, labels4 = random_affine(
            img4, labels4, degrees=self.hyp.get('degrees', 0),
            translate=self.hyp.get('translate', 0),
            scale=self.hyp.get('scale', 0), shear=self.hyp.get('shear', 0),
            border=-s // 2, rnd=self.rnd)
        return img4, labels4

    def __len__(self):
        return self.n

    def __getitem__(self, index):
        """Returns (img_hwc_rgb_uint8, labels (n,5) [cls,xywh norm], path, shapes)."""
        if self.image_weights:
            index = self.indices[index]
        if self.mosaic:
            img, labels = self._load_mosaic(index)
            shapes = None
        else:
            img, (h0, w0), (h, w) = self._load_image(index)
            shape = (self.batch_shapes[self.batch[index]] if self.rect
                     else self.img_size)
            img, ratio, pad = letterbox(img, shape, auto=False,
                                        scaleup=self.augment,
                                        is_gray_scale=self.is_gray_scale)
            shapes = (h0, w0), ((h / h0, w / w0), pad)
            lab = self.labels[index]
            labels = (xywhn_to_xyxy_pixels(lab, w, h, pad[0], pad[1],
                                           ratio[0], ratio[1])
                      if lab.size else np.zeros((0, 5), np.float32))

        if self.augment:
            if not self.mosaic:
                img, labels = random_affine(
                    img, labels, degrees=self.hyp.get('degrees', 0),
                    translate=self.hyp.get('translate', 0),
                    scale=self.hyp.get('scale', 0),
                    shear=self.hyp.get('shear', 0), rnd=self.rnd)
            if not self.is_gray_scale:
                img = np.ascontiguousarray(img)
                augment_hsv(img, self.hyp.get('hsv_h', 0),
                            self.hyp.get('hsv_s', 0),
                            self.hyp.get('hsv_v', 0), rnd=self.rnd)
            if self.cutout and self.rnd.random() < 0.9:
                # the reference's commented call site gates cutout at 90%
                # (utils/datasets.py:462-464)
                img = np.ascontiguousarray(img)
                labels = cutout(img,
                                np.asarray(labels, np.float32).reshape(-1, 5),
                                rnd=self.rnd)

        labels = np.asarray(labels, np.float32).reshape(-1, 5)
        if len(labels):
            labels[:, 1:5] = xyxy2xywh_np(labels[:, 1:5])
            labels[:, [2, 4]] /= img.shape[0]
            labels[:, [1, 3]] /= img.shape[1]

        if self.augment and self.rnd.random() < 0.5:  # lr flip
            img = np.fliplr(img)
            if len(labels):
                labels[:, 1] = 1 - labels[:, 1]
        if self.augment and self.ud_flip and self.rnd.random() < 0.5:
            img = np.flipud(img)  # (reference utils/datasets.py:484-488)
            if len(labels):
                labels[:, 2] = 1 - labels[:, 2]

        if not self.is_gray_scale:
            img = img[:, :, ::-1]  # BGR -> RGB, stays HWC for the TPU
        return np.ascontiguousarray(img), labels, self.path_of(index), shapes

    def class_weights(self, nc):
        """Inverse-frequency class weights (reference utils/utils.py:61-74)."""
        counts = np.bincount(
            np.concatenate([l[:, 0].astype(int) for l in self.labels
                            if len(l)] or [np.zeros(0, int)]), minlength=nc)
        w = 1.0 / np.maximum(counts, 1)
        return w / w.sum()

    def update_image_weights(self, nc, maps):
        """Image-weighted resampling (reference train.py:334-337)."""
        cw = self.class_weights(nc) * (1 - maps) ** 2
        iw = np.array([
            (np.bincount(l[:, 0].astype(int), minlength=nc) * cw).sum()
            for l in self.labels])
        tot = iw.sum()
        probs = iw / tot if tot > 0 else None
        self.indices = list(np.random.default_rng().choice(
            self.n, self.n, p=probs)) if probs is not None else list(range(self.n))


class BatchLoader:
    """Fixed-shape batch assembler with a background prefetch thread.

    Yields (imgs (bs,H,W,C) uint8, targets (max_t,6), valid (max_t,), paths,
    shapes). Replaces torch DataLoader + collate_fn (utils/datasets.py:500-508)
    with capacity-padded targets (see train/loss.py).
    """

    def __init__(self, dataset: DetectionDataset, batch_size: int,
                 max_targets: int = 0, shuffle: bool = False,
                 prefetch: int = 2, drop_last: bool = False, seed=None,
                 use_native: bool | None = None):
        self.ds = dataset
        self.bs = batch_size
        self.max_t = max_targets or (30 * batch_size)
        self.shuffle = shuffle
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.rnd = random.Random(seed)
        if use_native is None:
            from .. import native
            use_native = (native.available() and not dataset.augment and
                          not dataset.is_gray_scale)
        self.use_native = use_native

    def __len__(self):
        if self.drop_last:
            return self.ds.n // self.bs
        return math.ceil(self.ds.n / self.bs)

    def _assemble_native(self, idxs):
        """Batched C++ letterbox fast path (eval only): one OpenMP pass
        writes the whole NHWC batch; label math mirrors
        DetectionDataset.__getitem__ exactly."""
        from ..native import letterbox_batch
        from ..train.loss import pad_targets
        ds = self.ds
        raw, metas = [], []
        for i in idxs:
            img, (h0, w0), (h, w) = ds._load_image(i)
            raw.append(img)
            metas.append((i, h0, w0, h, w))
        shape = (ds.batch_shapes[ds.batch[idxs[0]]] if ds.rect
                 else (ds.img_size, ds.img_size))
        dst_h, dst_w = int(shape[0]), int(shape[1])
        batch, ratios, pads = letterbox_batch(raw, dst_h, dst_w,
                                              scaleup=ds.augment)
        labels, paths, shapes = [], [], []
        for j, (i, h0, w0, h, w) in enumerate(metas):
            r = float(ratios[j])
            padw, padh = float(pads[j, 0]), float(pads[j, 1])
            lab = ds.labels[i]
            if lab.size:
                px = xywhn_to_xyxy_pixels(lab, w, h, padw, padh, r, r)
                out = px.copy()
                out[:, 1:5] = xyxy2xywh_np(px[:, 1:5])
                out[:, [2, 4]] /= dst_h
                out[:, [1, 3]] /= dst_w
                labels.append(out.astype(np.float32))
            else:
                labels.append(np.zeros((0, 5), np.float32))
            paths.append(ds.path_of(i))
            shapes.append(((h0, w0), ((h / h0, w / w0), (padw, padh))))
        while len(labels) < self.bs:
            batch = np.concatenate(
                [batch, np.zeros((1, dst_h, dst_w, batch.shape[3]), np.uint8)])
            labels.append(np.zeros((0, 5), np.float32))
            paths.append('')
            shapes.append(None)
        tgt, valid = pad_targets(labels, self.max_t)
        return batch, tgt, valid, paths, shapes

    def _assemble(self, idxs):
        from ..train.loss import pad_targets
        if self.use_native:
            try:
                return self._assemble_native(idxs)
            except Exception:
                pass  # fall through to the per-image python path
        imgs, labels, paths, shapes = [], [], [], []
        for i in idxs:
            im, lab, p, sh = self.ds[i]
            imgs.append(im)
            labels.append(lab)
            paths.append(p)
            shapes.append(sh)
        # pad batch ragged edge by repeating last image (fixed batch shape)
        while len(imgs) < self.bs:
            imgs.append(np.zeros_like(imgs[0]))
            labels.append(np.zeros((0, 5), np.float32))
            paths.append('')
            shapes.append(None)
        tgt, valid = pad_targets(labels, self.max_t)
        return np.stack(imgs), tgt, valid, paths, shapes

    def __iter__(self):
        order = list(range(self.ds.n))
        if self.shuffle and not self.ds.rect:
            self.rnd.shuffle(order)
        batches = [order[i:i + self.bs] for i in range(0, len(order), self.bs)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.bs]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for b in batches:
                    q.put(self._assemble(b))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
