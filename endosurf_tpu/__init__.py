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

# Persistent XLA compilation cache: the chunked-long-run workflow (CLAUDE.md
# tunnel-dispatch limit) restarts the process every few thousand steps, and
# the flagship step otherwise recompiles from scratch each time (~7 min per
# chunk measured on the tunneled TPU). The cache dir is read lazily at first
# compilation, so setting it at package import covers every entry point
# regardless of jax import order. A JAX_COMPILATION_CACHE_DIR env value
# (including "" to disable) takes precedence.
import os as _os

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/endosurf_tpu_xla"))
    # Cache even fast-compiling kernels: chunked runs re-pay every one.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
