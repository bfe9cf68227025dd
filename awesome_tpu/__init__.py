"""awesome_tpu — a TPU-native (JAX/XLA/Pallas) framework for constrained
implicit-representation image segmentation.

Re-designs the capabilities of the reference framework ("AWESOME": implicit
representations for constrained image segmentation — convexity, star-shape,
path-connectedness, periodicity, symmetry priors) as an idiomatic JAX/TPU
stack:

- models are pure functions over parameter PyTrees (``awesome_tpu.nn``),
- the per-image prior fit is one compiled ``lax.scan`` program
  (``awesome_tpu.fit``), batched over images with ``vmap`` and sharded over a
  device mesh with ``jax.sharding`` (``awesome_tpu.parallel``),
- hot per-point ops are Pallas TPU kernels (``awesome_tpu.ops``).
"""

__version__ = "0.1.0"

from awesome_tpu.core import grids, transforms, tree  # noqa: F401
