from . import region, text, vision  # noqa: F401
