from .rescale import Rescale, compute_rescale

__all__ = ["Rescale", "compute_rescale"]
