from . import se3, camera, triangulate  # noqa: F401
