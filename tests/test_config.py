"""cfg/.data parser contract tests (reference utils/parse_config.py)."""

import numpy as np
import pytest

from yolo_tpu.config import parse_data_cfg, parse_model_cfg, load_classes


def test_parse_yolov3(repo_root):
    mdefs = parse_model_cfg(f'{repo_root}/cfg/yolov3/yolov3.cfg')
    assert mdefs[0]['type'] == 'net'
    body = mdefs[1:]
    assert len(body) == 107  # yolov3 has 107 layers
    assert body[0]['type'] == 'convolutional'
    assert body[0]['batch_normalize'] == 1
    assert body[0]['filters'] == 32
    # yolo blocks carry anchors as (-1, 2) float arrays
    yolos = [m for m in body if m['type'] == 'yolo']
    assert len(yolos) == 3
    assert yolos[0]['anchors'].shape == (9, 2)
    assert yolos[0]['mask'] == [6, 7, 8]
    assert yolos[0]['classes'] == 80


def test_parse_value_typing(tmp_path):
    cfg = tmp_path / 't.cfg'
    cfg.write_text('[net]\nwidth=416\nmomentum=0.9\n\n[convolutional]\n'
                   'batch_normalize=1\nfilters=16\nsize=3\nstride=1\npad=1\n'
                   'activation=leaky\n')
    mdefs = parse_model_cfg(str(cfg))
    assert mdefs[0]['width'] == 416          # digits -> int
    assert mdefs[0]['momentum'] == '0.9'     # floats stay strings (ref quirk)
    assert mdefs[1]['filters'] == 16


def test_unsupported_field_rejected(tmp_path):
    cfg = tmp_path / 'bad.cfg'
    cfg.write_text('[net]\n\n[convolutional]\nbogus_field=1\n')
    with pytest.raises(AssertionError):
        parse_model_cfg(str(cfg))


def test_parse_data_cfg(repo_root):
    opts = parse_data_cfg(f'{repo_root}/data_cfg/coco2014.data')
    assert opts['classes'] == '80'
    assert 'train' in opts and 'valid' in opts and 'names' in opts


def test_load_classes(repo_root):
    names = load_classes(f'{repo_root}/data_cfg/coco.names')
    assert len(names) == 80
    assert names[0] == 'person'


def test_all_zoo_cfgs_parse(repo_root):
    import glob
    cfgs = glob.glob(f'{repo_root}/cfg/**/*.cfg', recursive=True)
    assert len(cfgs) >= 40
    for c in cfgs:
        mdefs = parse_model_cfg(c)
        assert mdefs[0]['type'] == 'net'
