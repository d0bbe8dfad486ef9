"""Test configuration: run the whole suite on a virtual 8-device CPU mesh
(the JAX-native way to test sharded training without TPU hardware)."""
import os

# Must be set before jax is imported anywhere. Force CPU even when the
# environment presets a TPU platform (tests run on a virtual 8-CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Never use the persistent compile cache in tests: the shared dir mixes
# axon-TPU and multi-device-CPU entries, and deserialising an
# incompatible cached executable SIGABRTs a later shard_map test
# (measured; see tools/check_kernels.py main()). Also shields against
# any imported tool enabling the cache as a side effect.
jax.config.update("jax_enable_compilation_cache", False)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
