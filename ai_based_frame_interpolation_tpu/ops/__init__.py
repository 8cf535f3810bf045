from . import image, resize  # noqa: F401
