from . import fastload  # noqa: F401
