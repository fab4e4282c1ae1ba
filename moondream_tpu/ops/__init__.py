from . import image_crops, layers, rope  # noqa: F401
