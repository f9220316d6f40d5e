"""endosurf_tpu — TPU-native neural implicit surface reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the EndoSurf
reference codebase (MICCAI 2023): reconstruction of deforming tissue surfaces
from stereo endoscope video with neural deformation/SDF/radiance fields and a
NeuS-style volume renderer, plus a D-NeRF density baseline ("EndoNeRF").

Design stance (not a port):
  * one jit-compiled fixed-shape train step (no python chunk loops),
  * SDF spatial gradients via jax.vjp and deformation Jacobians via jax.jacfwd
    fused into a single field evaluation (the reference runs its network stack
    multiple times per step),
  * rays sharded across TPU chips with jax.sharding (pure data parallelism),
  * first-party C++ for host-side geometry (isosurface extraction, mesh
    cleanup, KD-tree point-cloud distance) where the reference used PyMCubes
    and Open3D.
"""

__version__ = "0.1.0"
