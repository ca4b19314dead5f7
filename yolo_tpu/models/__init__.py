from .network import Network, init_params, make_apply  # noqa: F401
from .yolo_head import decode_yolo  # noqa: F401
