from . import augment, dataset, hyps, loaders

__all__ = ["augment", "dataset", "hyps", "loaders"]
