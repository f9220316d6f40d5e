"""Test configuration: force an 8-device virtual CPU mesh.

The surrounding environment exports JAX_PLATFORMS=axon (tunneled TPU); plain
os.environ overrides are not honored by the plugin discovery, so the platform
is pinned via jax.config. XLA_FLAGS must still be set before jax initializes
its backends.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_execution_knobs():
    """Trainer setup flips module-global execution knobs (matmul precision,
    interior storage dtype, jac mode); restore them around every test so
    numerics/parity tests are insulated from trainer tests' side effects."""
    import endosurf_tpu.models.fields as fields
    import endosurf_tpu.ops.mlp as mlp

    saved = (mlp._MATMUL_PRECISION, mlp._SAMPLING_PRECISION,
             mlp._ACTIVATION_DTYPE, fields._DEFORM_JAC_MODE)
    yield
    (mlp._MATMUL_PRECISION, mlp._SAMPLING_PRECISION,
     mlp._ACTIVATION_DTYPE, fields._DEFORM_JAC_MODE) = saved
