"""Data pipeline: SHD-schema binning semantics, collate shapes, WAV
round-trip, padding buckets, label rules, loader determinism."""
import os

import numpy as np
import pytest

from sparch_tpu.data.audio import load_hd_or_sc, read_wav
from sparch_tpu.data.loader import DataLoader
from sparch_tpu.data.spiking import SpikingDataset, load_shd_or_ssc

from .fixtures import make_hd_tree, make_sc_tree, make_shd_h5, tone, write_wav


@pytest.fixture
def shd_folder(tmp_path):
    folder = str(tmp_path / "shd")
    os.makedirs(folder)
    make_shd_h5(f"{folder}/shd_train.h5", n=12, nb_classes=3)
    make_shd_h5(f"{folder}/shd_test.h5", n=8, nb_classes=3, seed=1)
    return folder


def test_binning_matches_digitize_semantics(tmp_path):
    """An event at time t lands in bin np.digitize(t, linspace(0,1.4,100)),
    and simultaneous events on one unit accumulate (the reference builds a
    sparse COO of ones and densifies, which sums duplicates)."""
    import h5py

    folder = str(tmp_path)
    path = f"{folder}/shd_train.h5"
    vlen_f = h5py.special_dtype(vlen=np.dtype("float64"))
    vlen_i = h5py.special_dtype(vlen=np.dtype("int64"))
    times = np.array([0.0, 0.005, 0.02, 0.7, 0.7, 1.39])
    units = np.array([0, 0, 5, 10, 10, 699])
    with h5py.File(path, "w") as f:
        g = f.create_group("spikes")
        dt = g.create_dataset("times", (1,), dtype=vlen_f)
        du = g.create_dataset("units", (1,), dtype=vlen_i)
        dt[0] = times
        du[0] = units
        f.create_dataset("labels", data=np.array([2], np.int64))

    ds = SpikingDataset("shd", folder, "train", nb_steps=100)
    x, y = ds[0]
    assert x.shape == (100, 700)
    assert y == 2
    bins = np.linspace(0, 1.4, 100)
    expected_bins = np.digitize(times, bins)
    # t=0.0 and t=0.005 both fall in bin 1 (edges ~0.01414 apart) -> sum to 2
    assert expected_bins[0] == expected_bins[1] == 1
    assert x[1, 0] == 2.0
    assert x[expected_bins[2], 5] == 1.0
    assert x[expected_bins[3], 10] == 2.0  # duplicate events sum
    assert x[expected_bins[5], 699] == 1.0
    assert x.sum() == 6.0


def test_shd_loader_batches(shd_folder):
    loader = load_shd_or_ssc("shd", shd_folder, "train", batch_size=5)
    batches = list(loader)
    assert len(batches) == 3  # 12 items, batch 5 -> 5,5,2
    xs, xlens, ys = batches[0]
    assert xs.shape == (5, 100, 700)
    assert xs.dtype == np.float32
    assert xlens.tolist() == [100] * 5
    assert ys.dtype == np.int64
    assert batches[-1][0].shape[0] == 2


def test_shd_valid_maps_to_test(shd_folder):
    loader = load_shd_or_ssc("shd", shd_folder, "valid", batch_size=4,
                             shuffle=False)
    n = sum(b[0].shape[0] for b in loader)
    assert n == 8  # test split size


def test_invalid_names_raise(shd_folder):
    with pytest.raises(ValueError, match="Invalid dataset name"):
        load_shd_or_ssc("mnist", shd_folder, "train", 4)
    with pytest.raises(ValueError, match="Invalid split name"):
        load_shd_or_ssc("shd", shd_folder, "dev", 4)


def test_loader_shuffle_determinism(shd_folder):
    la = load_shd_or_ssc("shd", shd_folder, "train", 4, shuffle=True, seed=3)
    lb = load_shd_or_ssc("shd", shd_folder, "train", 4, shuffle=True, seed=3)
    ya = np.concatenate([b[2] for b in la])
    yb = np.concatenate([b[2] for b in lb])
    np.testing.assert_array_equal(ya, yb)
    # next epoch reshuffles
    ya2 = np.concatenate([b[2] for b in la])
    assert not np.array_equal(ya, ya2)


def test_wav_roundtrip(tmp_path):
    x = tone(440.0, dur=0.1)
    p = str(tmp_path / "t.wav")
    write_wav(p, x)
    x2 = read_wav(p)
    assert x2.shape == x.shape
    np.testing.assert_allclose(x2, x, atol=1e-4)


def test_hd_dataset_and_labels(tmp_path):
    folder = str(tmp_path / "hd")
    make_hd_tree(folder, n_per_digit=2, digits=(0, 1))
    loader = load_hd_or_sc("hd", folder, "train", batch_size=4, shuffle=False)
    xs, xlens, ys = next(iter(loader))
    assert xs.shape[0] == 4
    assert xs.shape[2] == 40  # fbank bins
    assert sorted(ys.tolist()) == [0, 0, 1, 1]
    assert (xlens <= xs.shape[1]).all()
    # hd valid -> test split
    lv = load_hd_or_sc("hd", folder, "valid", batch_size=4, shuffle=False)
    assert next(iter(lv))[0].shape[0] == 4


def test_sc_dataset_splits_and_labels(tmp_path):
    folder = str(tmp_path / "sc")
    make_sc_tree(folder, labels=("go", "stop"), n_per_label=3)
    train = load_hd_or_sc("sc", folder, "train", batch_size=8, shuffle=False)
    xs, xlens, ys = next(iter(train))
    assert xs.shape[0] == 2  # 6 total minus 2 valid minus 2 test
    valid = load_hd_or_sc("sc", folder, "valid", batch_size=8, shuffle=False)
    assert next(iter(valid))[0].shape[0] == 2
    test = load_hd_or_sc("sc", folder, "test", batch_size=8, shuffle=False)
    xs_t, _, ys_t = next(iter(test))
    assert xs_t.shape[0] == 2
    assert set(ys_t.tolist()) == {0, 1}  # 'go'=0, 'stop'=1 (sorted dirs)


def test_pad_multiple_buckets(tmp_path):
    folder = str(tmp_path / "hd2")
    make_hd_tree(folder, n_per_digit=2, digits=(0, 1))
    loader = load_hd_or_sc(
        "hd", folder, "train", batch_size=4, shuffle=False, pad_multiple=50
    )
    xs, xlens, _ = next(iter(loader))
    assert xs.shape[1] % 50 == 0
    assert xs.shape[1] >= xlens.max()


def test_augmentation_runs(tmp_path):
    folder = str(tmp_path / "hd3")
    make_hd_tree(folder, n_per_digit=2, digits=(0, 1))
    loader = load_hd_or_sc(
        "hd", folder, "train", batch_size=4, shuffle=False,
        use_augm=True, p_noise=1.0,
    )
    xs, _, _ = next(iter(loader))
    assert np.isfinite(xs).all()


def test_dataloader_prefetch_equivalence(shd_folder):
    ds = SpikingDataset("shd", shd_folder, "train")
    a = DataLoader(ds, 4, ds.generate_batch, shuffle=False, prefetch=0)
    b = DataLoader(ds, 4, ds.generate_batch, shuffle=False, prefetch=2)
    for (xa, _, ya), (xb, _, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_dataloader_batch_transform_all_paths(shd_folder):
    """batch_transform (the --input_dtype producer-side cast seam) must
    apply identically on the no-prefetch, prefetch-thread and worker-pool
    paths."""
    import ml_dtypes

    ds = SpikingDataset("shd", shd_folder, "train")

    def cast(batch):
        x, xlens, y = batch
        return x.astype(ml_dtypes.bfloat16), xlens, y

    ref = DataLoader(ds, 4, ds.generate_batch, shuffle=False, prefetch=0)
    for prefetch, workers in ((0, 0), (2, 0), (2, 2)):
        loader = DataLoader(
            ds, 4, ds.generate_batch, shuffle=False,
            prefetch=prefetch, workers=workers, batch_transform=cast,
        )
        try:
            for (xr, _, yr), (xt, _, yt) in zip(ref, loader):
                assert xt.dtype == ml_dtypes.bfloat16
                np.testing.assert_array_equal(
                    xr.astype(ml_dtypes.bfloat16), xt
                )
                np.testing.assert_array_equal(yr, yt)
        finally:
            loader.close()


def test_dataloader_propagates_worker_errors():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = DataLoader(Bad(), 2, lambda b: b, prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_loader_shards_partition_global_batches(shd_folder):
    from sparch_tpu.data.spiking import SpikingDataset

    ds = SpikingDataset("shd", shd_folder, "train")
    full = DataLoader(ds, 4, ds.generate_batch, shuffle=True, seed=7)
    shards = [
        DataLoader(ds, 4, ds.generate_batch, shuffle=True, seed=7,
                   num_shards=2, shard_index=i)
        for i in range(2)
    ]
    for (xf, _, yf), (x0, _, y0), (x1, _, y1) in zip(full, *shards):
        # the two host slices concatenate to the global batch, in order
        np.testing.assert_array_equal(
            np.concatenate([y0, y1]), yf
        )
        np.testing.assert_array_equal(np.concatenate([x0, x1]), xf)


def test_workers_match_single_process_spiking(shd_folder):
    """Multi-process loading yields byte-identical batches (dropout-free
    deterministic pipeline; same shuffle order from the shared seed)."""
    from sparch_tpu.data.spiking import load_shd_or_ssc

    a = load_shd_or_ssc("shd", shd_folder, "train", batch_size=4,
                        shuffle=True, seed=3, workers=0)
    b = load_shd_or_ssc("shd", shd_folder, "train", batch_size=4,
                        shuffle=True, seed=3, workers=2)
    try:
        for (xa, la, ya), (xb, lb, yb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
    finally:
        b.close()


def test_workers_match_single_process_audio(tmp_path):
    """Audio pipeline (wav -> fbank, no augmentation) matches across
    worker counts; with augmentation it still produces valid batches."""
    from .fixtures import make_hd_tree
    from sparch_tpu.data.audio import load_hd_or_sc

    root = str(tmp_path / "hd")
    import os
    os.makedirs(root)
    make_hd_tree(root, n_per_digit=3)
    a = load_hd_or_sc("hd", root, "train", batch_size=3, shuffle=False,
                      use_augm=False, min_snr=1e-4, max_snr=0.9,
                      p_noise=0.1, workers=0)
    b = load_hd_or_sc("hd", root, "train", batch_size=3, shuffle=False,
                      use_augm=False, min_snr=1e-4, max_snr=0.9,
                      p_noise=0.1, workers=2)
    try:
        for (xa, la, ya), (xb, lb, yb) in zip(a, b):
            np.testing.assert_allclose(xa, xb, atol=1e-6)
            np.testing.assert_array_equal(ya, yb)
            np.testing.assert_array_equal(la, lb)
    finally:
        b.close()

    # augmentation on: batches are valid (shape/dtype/finite) and the
    # pool survives several epochs
    c = load_hd_or_sc("hd", root, "train", batch_size=3, shuffle=True,
                      use_augm=True, min_snr=1e-4, max_snr=0.9,
                      p_noise=0.5, workers=2)
    try:
        for _ in range(2):
            for x, lens, y in c:
                assert np.isfinite(x).all()
                assert x.shape[0] == len(y) == len(lens)
    finally:
        c.close()


def test_sharded_loader_drops_ragged_final_batch(shd_folder):
    """Multi-host sharding forces drop_last: a ragged final batch would
    give hosts unequal (possibly empty) slices and desynchronize the
    SPMD processes. Every yielded shard slice is exactly batch/shards."""
    from sparch_tpu.data.spiking import SpikingDataset

    ds = SpikingDataset("shd", shd_folder, "train")
    n = len(ds)
    bs = 10  # 12 items -> one full batch + a ragged remainder of 2
    assert n % bs != 0
    loaders = [
        DataLoader(ds, bs, ds.generate_batch, shuffle=False,
                   num_shards=2, shard_index=i)
        for i in range(2)
    ]
    counts = []
    for ld in loaders:
        batches = list(ld)
        assert len(batches) == n // bs == len(ld)
        assert all(len(b[2]) == bs // 2 for b in batches)
        counts.append(len(batches))
    assert counts[0] == counts[1]


def test_prefetch_producer_exits_on_abandoned_epoch(shd_folder):
    """Breaking out of an epoch mid-iteration must not leak a producer
    thread blocked on the bounded queue."""
    import threading
    import time

    from sparch_tpu.data.spiking import SpikingDataset

    ds = SpikingDataset("shd", shd_folder, "train")
    loader = DataLoader(ds, 2, ds.generate_batch, prefetch=1)
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
