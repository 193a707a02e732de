from . import audio_io, duration, textnorm  # noqa: F401
