from .engine import DecodeOutputs, decode_tokens, jitted_decoder  # noqa: F401
