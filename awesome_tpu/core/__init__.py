from awesome_tpu.core import grids, transforms, tree  # noqa: F401
