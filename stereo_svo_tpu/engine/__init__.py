# Intentionally minimal: submodules are imported directly
# (frontend.keyframe ↔ engine.state would otherwise form an import cycle).
