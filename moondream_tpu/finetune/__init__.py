from . import trainer  # noqa: F401
