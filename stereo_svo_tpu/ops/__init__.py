from . import interp, pyramid, fast, stereo_match  # noqa: F401
