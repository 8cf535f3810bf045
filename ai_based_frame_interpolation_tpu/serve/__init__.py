from . import server  # noqa: F401
