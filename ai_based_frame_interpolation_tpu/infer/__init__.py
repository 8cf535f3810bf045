from .engine import InterpolationEngine  # noqa: F401
