"""Media-source loaders on synthesized video files (VERDICT r3 next #7):
LoadImages video iteration, detect.py --source video.mp4 (video-writer
path), and LoadStreams driven by a file URL — hermetic, no camera/RTSP."""

import os
import sys
import time

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yolo_tpu.data.datasets import LoadImages, LoadStreams


def _write_video(path, n_frames=8, w=128, h=96, fps=10):
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*'mp4v'), fps,
                         (w, h))
    assert vw.isOpened(), 'cv2 mp4v encoder unavailable'
    for i in range(n_frames):
        img = np.full((h, w, 3), 30, np.uint8)
        cv2.rectangle(img, (8 + 6 * i, 20), (48 + 6 * i, 60),
                      (0, 0, 255), -1)
        vw.write(img)
    vw.release()
    return str(path)


@pytest.fixture(scope='module')
def video_file(tmp_path_factory):
    return _write_video(tmp_path_factory.mktemp('vid') / 'clip.mp4')


def test_load_images_video_iteration(video_file):
    """LoadImages iterates every frame of a video file (reference
    utils/datasets.py:78-104), letterboxed CHW RGB."""
    src = LoadImages(video_file, img_size=128)
    assert len(src) == 1 and src.video_flag == [True]
    frames = list(src)
    assert len(frames) == 8, len(frames)
    path, img, img0, cap = frames[0]
    assert path == video_file and src.mode == 'video'
    assert img.shape[0] == 3 and img.shape[1] % 32 == 0
    assert img0.shape == (96, 128, 3)
    assert cap is not None and src.nframes == 8


def test_load_images_mixed_dir(video_file, tmp_path):
    """A directory holding images AND a video yields images first, then
    every video frame (reference utils/datasets.py:60-69 ordering)."""
    d = tmp_path / 'mixed'
    d.mkdir()
    cv2.imwrite(str(d / 'a.jpg'), np.zeros((64, 64, 3), np.uint8))
    import shutil
    shutil.copy(video_file, d / 'clip.mp4')
    src = LoadImages(str(d), img_size=128)
    items = list(src)
    assert len(items) == 1 + 8
    assert items[0][0].endswith('a.jpg')
    assert all(p.endswith('clip.mp4') for p, *_ in items[1:])


def test_load_streams_file_source(video_file):
    """LoadStreams (daemon reader threads, every-4th-frame decode) against
    a file source: frames arrive as an (S, 3, H, W) batch."""
    streams = LoadStreams(video_file, img_size=128)
    it = iter(streams)
    sources, img, img0, _ = next(it)
    assert sources == [video_file]
    assert img.ndim == 4 and img.shape[0] == 1 and img.shape[1] == 3
    assert img0[0].shape == (96, 128, 3)
    time.sleep(0.15)               # let the reader thread advance frames
    _, img2, _, _ = next(it)
    assert img2.shape == img.shape


def test_load_streams_txt_list(video_file, tmp_path):
    """streams.txt lists one source per line (reference
    utils/datasets.py:196-204)."""
    lst = tmp_path / 'streams.txt'
    lst.write_text(f'{video_file}\n')
    streams = LoadStreams(str(lst), img_size=128)
    sources, img, _, _ = next(iter(streams))
    assert sources == [video_file] and img.shape[0] == 1


def test_detect_cli_video_writer(video_file, tmp_path, monkeypatch):
    """detect.py --source clip.mp4 runs the video branch end-to-end and
    writes an output video via cv2.VideoWriter (reference detect.py:155-170)."""
    monkeypatch.chdir(tmp_path)
    import re
    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests', 'test_cli.py')).read()
    cfg_text = re.search(r'TOY_CFG = """(.*?)"""', src, re.S).group(1)
    (tmp_path / 'toy.cfg').write_text(cfg_text)
    (tmp_path / 'obj.names').write_text('thing\n')
    (tmp_path / 'obj.data').write_text(
        f'classes=1\ntrain=x\nvalid=x\nnames={tmp_path}/obj.names\n')

    import detect as detect_cli
    detect_cli.main(['--cfg', str(tmp_path / 'toy.cfg'),
                     '--data', str(tmp_path / 'obj.data'),
                     '--weights', '', '--source', video_file,
                     '--output', str(tmp_path / 'out'),
                     '--img-size', '64', '--conf-thres', '0.001'])
    out = tmp_path / 'out' / os.path.basename(video_file)
    assert out.exists(), list((tmp_path / 'out').iterdir())
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 8
    cap.release()
