from . import fsq, vocos  # noqa: F401
