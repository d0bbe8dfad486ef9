"""In-kernel ICI collectives for tensor-parallel fused cells.

Runs the Pallas TPU interpret mode's multi-device simulation on the
virtual CPU mesh: remote DMAs + semaphores behave as on hardware ICI,
so the kernel-side all-gather / reduce-scatter building blocks are
pinned here exactly as the seqpipe collectives are pinned on the same
mesh. (Reference has no parallelism — SURVEY.md §2; this is TPU-native
substrate.)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sparch_tpu.ops import pallas_tp


@pytest.fixture(autouse=True)
def _reset_interpret_state():
    """The TPU interpret mode simulates cross-chip DMAs/semaphores through
    process-global state; stale state from a previous test's simulated
    mesh corrupts the next one (observed: NaN slots when the suite runs
    back-to-back but each test passes alone)."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.reset_tpu_interpret_mode_state()
    yield
    pltpu.reset_tpu_interpret_mode_state()


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("model",))


def _shmap(fn, mesh, in_specs, out_specs):
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


try:  # JAX 0.9: jax.shard_map(check_vma=); older: check_rep
    jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def _shmap(fn, mesh, in_specs, out_specs):  # noqa: F811
        return jax.jit(
            _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False)
        )


@pytest.mark.parametrize("num_devices", [2, 4])
def test_in_kernel_all_gather(num_devices):
    mesh = _mesh(num_devices)
    B, hloc, rounds = 8, 128, 3
    H = hloc * num_devices
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H), jnp.float32)

    fn = _shmap(
        functools.partial(
            pallas_tp.tp_all_gather, axis_name="model",
            num_devices=num_devices, rounds=rounds,
        ),
        mesh, P(None, "model"), P(None, None, None),
    )
    out = fn(x)  # replicated (rounds, B, H) — every chip gathered the same
    assert out.shape == (rounds, B, H)
    for r in range(rounds):
        # rounds accumulate +1 in-kernel: (x+1)+1 vs x+2 differ by one ulp
        np.testing.assert_allclose(
            np.asarray(out[r]), np.asarray(x) + r, rtol=0, atol=1e-5
        )


@pytest.mark.parametrize("num_devices", [2, 4])
def test_in_kernel_reduce_scatter(num_devices):
    mesh = _mesh(num_devices)
    B, hloc, rounds = 8, 128, 3
    H = hloc * num_devices
    # one distinct (B, H) partial per chip, stacked on a leading axis
    parts = jax.random.normal(
        jax.random.PRNGKey(1), (num_devices, B, H), jnp.float32
    )

    def per_shard(p):
        return pallas_tp.tp_reduce_scatter(
            p[0], axis_name="model", num_devices=num_devices, rounds=rounds,
        )

    fn = _shmap(per_shard, mesh, P("model", None, None),
                P(None, None, "model"))
    out = fn(parts)  # (rounds, B, H), rounds chained (see _rs_kernel)
    parts_np = np.asarray(parts)
    prev = None
    for r in range(rounds):
        if r == 0:
            stages = [parts_np[q] for q in range(num_devices)]
        else:
            stages = [
                parts_np[q] + prev[:, q * hloc : q * hloc + 1]
                for q in range(num_devices)
            ]
        prev = np.sum(np.stack(stages), axis=0)
        np.testing.assert_allclose(
            np.asarray(out[r]), prev, rtol=0, atol=1e-4
        )


def test_all_gather_distinct_shards():
    """Each chip contributes a DIFFERENT block; gather must place every
    block at its sender's column offset (catches any my-id/offset mixup
    the replicated-input test would miss)."""
    num_devices = 4
    mesh = _mesh(num_devices)
    B, hloc = 8, 128
    H = hloc * num_devices
    x = jnp.arange(B * H, dtype=jnp.float32).reshape(B, H)

    fn = _shmap(
        functools.partial(
            pallas_tp.tp_all_gather, axis_name="model",
            num_devices=num_devices, rounds=1,
        ),
        mesh, P(None, "model"), P(None, None, None),
    )
    out = fn(x)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x))
