from . import harness, report  # noqa: F401
