from . import ba, loop_closure, pose_graph  # noqa: F401
