from .numeric import davg, dsum, dstddev, ratio  # noqa: F401
