from . import t5gemma, voice  # noqa: F401
