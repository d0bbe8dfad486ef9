"""Native C++ binning kernel: builds, and agrees exactly with the NumPy
digitize+scatter reference on random event streams."""
import numpy as np
import pytest

from sparch_tpu.data import native


def _np_reference(times, units, edges, nb_steps, nb_units):
    idx = np.digitize(times, edges)
    keep = idx < nb_steps
    out = np.zeros((nb_steps, nb_units), np.float32)
    np.add.at(out, (idx[keep], units[keep]), 1.0)
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
    assert got.sum() == (np.digitize(times, edges) < 100).sum()


def test_edge_semantics():
    """np.digitize boundary behaviour: t exactly on an edge goes to the
    right bin (bins[i-1] <= t < bins[i]); t at/after the final edge is
    dropped (reference's out-of-range sparse indices vanish on to_dense)."""
    edges = np.linspace(0, 1.4, 100)
    times = np.array([0.0, edges[1], edges[50], 1.4, 2.0])
    units = np.array([0, 1, 2, 3, 4])
    got = native.bin_events(times, units, edges, 100, 700)
    assert got[1, 0] == 1.0  # 0.0 >= edges[0] -> bin 1
    assert got[2, 1] == 1.0  # exactly on edges[1] -> bin 2
    assert got[51, 2] == 1.0
    assert got[:, 3].sum() == 0.0  # t == last edge -> dropped
    assert got[:, 4].sum() == 0.0  # t beyond window -> dropped
    assert got.sum() == 3.0


def test_out_of_window_events_match_reference_oracle(tmp_path):
    """Pin the reference's actual behaviour for events at t >= max_time:
    they digitize past the last bin and torch's sparse-to-dense silently
    drops them. Our pipeline must produce the identical raster."""
    import sys

    import h5py

    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        np.int = int  # reference uses the removed numpy alias
        from sparch.dataloaders.spiking_datasets import (
            SpikingDataset as RefDataset,
        )
    finally:
        sys.path.remove("/root/reference")

    vlen_f = h5py.special_dtype(vlen=np.dtype("float64"))
    vlen_i = h5py.special_dtype(vlen=np.dtype("int64"))
    times = np.array([0.1, 0.1, 1.39, 1.4, 1.5])
    units = np.array([5, 5, 6, 7, 8], dtype=np.int64)
    with h5py.File(tmp_path / "shd_train.h5", "w") as f:
        g = f.create_group("spikes")
        dt = g.create_dataset("times", (1,), dtype=vlen_f)
        du = g.create_dataset("units", (1,), dtype=vlen_i)
        dt[0] = times
        du[0] = units
        f.create_dataset("labels", data=np.array([3.0]))

    ref = RefDataset("shd", str(tmp_path), "train", nb_steps=100)
    ref_x, _ = ref[0]
    ref_x = ref_x.numpy()
    assert ref_x.sum() == 3.0  # the 1.4 s and 1.5 s events vanished
    assert ref_x[99, 6] == 1.0 and ref_x[:, 7].sum() == 0.0

    from sparch_tpu.data.spiking import SpikingDataset

    ours = SpikingDataset("shd", str(tmp_path), "train", nb_steps=100)
    our_x, _ = ours[0]
    np.testing.assert_array_equal(our_x, ref_x)
