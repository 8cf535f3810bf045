from .logging import StageTimer, get_logger  # noqa: F401
