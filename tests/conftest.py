"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices per the JAX-recommended recipe.
Env vars must be set before the first `import jax` anywhere in the test
process, which pytest guarantees by importing conftest first.
"""

import os

# NOTE: this environment pins JAX_PLATFORMS=axon (TPU tunnel) via
# sitecustomize, and env-var overrides are merged rather than replaced —
# force the CPU backend through explicit config updates instead.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: CPU conv compiles dominate test wall-clock
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# f32 matmuls/convs must accumulate in true f32 for the <=1e-3 parity budget
# (TPU would otherwise use bf16 passes; bf16 production paths are unaffected)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
