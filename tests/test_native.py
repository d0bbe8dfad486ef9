"""Native C++ binning kernel: builds, and agrees exactly with the NumPy
digitize+scatter reference on random event streams."""
import numpy as np
import pytest

from sparch_tpu.data import native


def _np_reference(times, units, edges, nb_steps, nb_units):
    idx = np.minimum(np.digitize(times, edges), nb_steps - 1)
    out = np.zeros((nb_steps, nb_units), np.float32)
    np.add.at(out, (idx, units), 1.0)
    return out


def test_native_builds():
    assert native.native_available(), "g++ build of binning.cpp failed"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 500))
    times = np.sort(rng.uniform(0, 1.45, n))  # include out-of-range tail
    units = rng.integers(0, 700, n)
    edges = np.linspace(0, 1.4, 100)
    got = native.bin_events(times, units, edges, 100, 700)
    want = _np_reference(times, units, edges, 100, 700)
    np.testing.assert_array_equal(got, want)
    assert got.sum() == n


def test_edge_semantics():
    """np.digitize boundary behaviour: t exactly on an edge goes to the
    right bin (bins[i-1] <= t < bins[i])."""
    edges = np.linspace(0, 1.4, 100)
    times = np.array([0.0, edges[1], edges[50], 1.4, 2.0])
    units = np.array([0, 1, 2, 3, 4])
    got = native.bin_events(times, units, edges, 100, 700)
    assert got[1, 0] == 1.0  # 0.0 >= edges[0] -> bin 1
    assert got[2, 1] == 1.0  # exactly on edges[1] -> bin 2
    assert got[51, 2] == 1.0
    assert got[99, 3] == 1.0  # >= last edge clamps to final bin
    assert got[99, 4] == 1.0
