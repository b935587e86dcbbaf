from . import align_kernel, pyramid_kernel  # noqa: F401
