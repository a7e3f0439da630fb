from . import blocks, heads, initializers

__all__ = ["blocks", "heads", "initializers"]
