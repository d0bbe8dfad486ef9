"""Surrogate gradient: exact forward Heaviside and boxcar backward,
including the half-open boundary (reference snns.py:29,33-36)."""
import jax
import jax.numpy as jnp
import numpy as np

from sparch_tpu.ops.surrogate import boxcar_window, spike_boxcar


def test_forward_heaviside():
    x = jnp.array([-1.0, -0.5, 0.0, 1e-7, 0.5, 2.0])
    out = spike_boxcar(x)
    np.testing.assert_array_equal(out, [0.0, 0.0, 0.0, 1.0, 1.0, 1.0])


def test_backward_boxcar_exact():
    # grad zeroed where x <= -0.5 or x > 0.5 (half-open interval)
    xs = jnp.array([-1.0, -0.5001, -0.5, -0.4999, 0.0, 0.4999, 0.5, 0.5001, 1.0])
    grads = jax.vmap(jax.grad(spike_boxcar))(xs)
    expected = [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 0.0, 0.0]
    np.testing.assert_array_equal(np.asarray(grads), expected)


def test_backward_scales_incoming_gradient():
    x = jnp.array([0.25, 0.75])
    g = jnp.array([3.0, 3.0])
    _, vjp = jax.vjp(spike_boxcar, x)
    (gx,) = vjp(g)
    np.testing.assert_array_equal(np.asarray(gx), [3.0, 0.0])


def test_window_matches_grad():
    xs = jnp.linspace(-1.0, 1.0, 41)
    grads = jax.vmap(jax.grad(spike_boxcar))(xs)
    np.testing.assert_array_equal(np.asarray(grads), np.asarray(boxcar_window(xs)))


def test_composes_with_scan_and_jit():
    def f(x):
        def step(c, xt):
            s = spike_boxcar(xt - c)
            return c * 0.9 + s.sum() * 0.01, s

        _, ys = jax.lax.scan(step, 0.3, x)
        return ys.sum()

    x = jax.random.normal(jax.random.PRNGKey(0), (10, 4))
    g = jax.jit(jax.grad(f))(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
