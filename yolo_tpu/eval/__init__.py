from .metrics import ap_per_class, compute_ap, fitness  # noqa: F401
from .evaluator import evaluate  # noqa: F401
