from . import batching, dataset, manifest  # noqa: F401
