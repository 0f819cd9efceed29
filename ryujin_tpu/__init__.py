"""ryujin_tpu: a TPU-native framework for hyperbolic systems of
conservation laws with the capabilities of conservation-laws/ryujin.

Compute path: JAX/XLA (+ Pallas kernels) over padded ELL stencils or
structured lattices; multi-chip via jax.sharding + shard_map.
"""

__version__ = "0.1.0"
