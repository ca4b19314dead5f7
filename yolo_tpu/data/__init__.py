from .transforms import letterbox, augment_hsv, random_affine  # noqa: F401
from .datasets import (LoadImages, LoadWebcam, LoadStreams,  # noqa: F401
                       DetectionDataset, BatchLoader, IMG_FORMATS, VID_FORMATS)
