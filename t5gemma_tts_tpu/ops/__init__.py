from . import masks, rope, sampling  # noqa: F401
