from . import generate, sampling  # noqa: F401
