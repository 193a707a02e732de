from . import hf_export  # noqa: F401
