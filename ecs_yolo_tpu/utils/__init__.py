from . import checkpoint, general

__all__ = ["checkpoint", "general"]
