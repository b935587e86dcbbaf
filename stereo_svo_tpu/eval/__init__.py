from . import ate  # noqa: F401
