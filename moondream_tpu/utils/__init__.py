from . import points, streaming  # noqa: F401
