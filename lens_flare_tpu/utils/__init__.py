from . import image, exr  # noqa: F401
