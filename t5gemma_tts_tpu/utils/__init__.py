from . import profiling, snapshot  # noqa: F401
