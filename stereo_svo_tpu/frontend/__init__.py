from . import detector  # noqa: F401
