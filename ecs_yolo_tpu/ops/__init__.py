from . import anchors, boxes, metrics, nms

__all__ = ["anchors", "boxes", "metrics", "nms"]
