from . import loss_v1, loss_tal, tal

__all__ = ["loss_v1", "loss_tal", "tal"]
