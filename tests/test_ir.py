"""Graph IR construction tests: channel bookkeeping and routing vs the
reference create_modules semantics (models.py:11-347)."""

import glob

import numpy as np
import pytest

from yolo_tpu.ir import build_ir


def test_yolov3_ir(repo_root):
    net = build_ir(f'{repo_root}/cfg/yolov3/yolov3.cfg')
    assert len(net.layers) == 107
    assert net.yolo_layers == [82, 94, 106]
    assert net.nc == 80
    # strides in order P5, P4, P3
    strides = [l.yolo_stride for l in net.layers if l.kind == 'yolo']
    assert strides == [32, 16, 8]
    # first conv
    l0 = net.layers[0]
    assert (l0.kind, l0.filters, l0.size, l0.stride, l0.bn) == ('conv', 32, 3, 1, True)
    # shortcut-preceding conv marked for YOLO bias init
    assert net.layers[81].smart_bias and net.layers[81].filters == 255


def test_yolov4_stride_reversal(repo_root):
    net = build_ir(f'{repo_root}/cfg/yolov4/yolov4.cfg')
    strides = [l.yolo_stride for l in net.layers if l.kind == 'yolo']
    assert strides == [8, 16, 32]  # reversed (models.py:312-315)
    # yolov4 has mish activations and weighted shortcuts? (weighted only if
    # weights_type present); at minimum mish must appear
    assert any(l.activation == 'mish' for l in net.layers if l.kind == 'conv')


def test_yolov4_tiny_route_groups(repo_root):
    net = build_ir(f'{repo_root}/cfg/yolov4tiny/yolov4-tiny.cfg')
    groups_routes = [l for l in net.layers if l.kind == 'route' and l.route_groups]
    assert groups_routes, 'yolov4-tiny must contain group-split routes'
    strides = [l.yolo_stride for l in net.layers if l.kind == 'yolo']
    assert strides == [32, 16]  # NOT reversed for yolov4-tiny


def test_tiny_maxpool(repo_root):
    net = build_ir(f'{repo_root}/cfg/yolov3tiny/yolov3-tiny.cfg')
    mp = [l for l in net.layers if l.kind == 'maxpool']
    assert any(l.size == 2 and l.stride == 1 for l in mp)  # zero-pad case


def test_mobilenet_depthwise_se(repo_root):
    net = build_ir(f'{repo_root}/cfg/yolov3-mobilenet/yolov3-mobilenet-coco.cfg')
    assert any(l.kind == 'depthwise' for l in net.layers)
    assert any(l.kind == 'se' for l in net.layers)
    assert any(l.activation == 'h_swish' for l in net.layers
               if l.kind in ('conv', 'depthwise'))


def test_grayscale_channels(repo_root):
    net = build_ir(f'{repo_root}/cfg/yolov3-singlechannel/yolov3-singlechannel.cfg',
                   is_gray_scale=True)
    assert net.in_channels == 1
    assert net.layers[0].in_channels == 1


@pytest.mark.parametrize('family', ['yolov2', 'yolov3', 'yolov3tiny', 'yolov4',
                                    'yolov4tiny', 'yolov3-mobilenet',
                                    'yolov3-ghostnet'])
def test_zoo_builds(repo_root, family):
    for c in glob.glob(f'{repo_root}/cfg/{family}/*.cfg'):
        net = build_ir(c)
        assert len(net.layers) > 5
        assert net.yolo_layers, c
