from . import activations, boxes, conv, nms  # noqa: F401
