"""afford_motion_tpu — a TPU-native (JAX/XLA/Pallas) framework for
language-guided human motion generation with scene affordance.

Re-designed from scratch for TPU with the capabilities of the reference
afford-motion system (two-stage contact/motion conditional diffusion):

- ``diffusion``: Gaussian diffusion math as pure pytrees + functions;
  sampling loops are ``lax.scan`` bodies compiled once.
- ``ops``: point-cloud primitives (FPS, kNN, grouping, interpolation) in a
  dense ``(B, N, C)`` layout on the MXU/VPU, with Pallas kernels for the
  sequential/top-k hot spots.
- ``models``: flax.linen denoisers (CDM stage-1 contact model, CMDM stage-2
  motion model) with conditions pre-encoded outside the sampling scan.
- ``data``: numpy dataset loaders wire-compatible with the reference's data
  directory layout, feeding fixed-shape device batches.
- ``train``: jit/shard_map data-parallel training loop with Orbax
  checkpointing.
"""

__version__ = "0.1.0"
