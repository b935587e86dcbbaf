from . import ba, pose_graph  # noqa: F401
