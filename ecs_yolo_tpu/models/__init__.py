from .yolo import build_model, parse_model, DetectionModel, BuiltModel

__all__ = ["build_model", "parse_model", "DetectionModel", "BuiltModel"]
