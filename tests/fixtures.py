"""Synthetic dataset fixtures in the exact on-disk layouts the loaders read:

- SHD/SSC: HDF5 with ragged ``spikes/times``, ``spikes/units``, ``labels``
  (the Heidelberg schema, reference spiking_datasets.py:57-61);
- HD: ``audio/*.wav`` (actually any name list) + ``{split}_filenames.txt``;
- SC: ``<label>/*.wav`` subdirs + ``validation_list.txt``/``testing_list.txt``.

Labels are made linearly separable from the spike/energy content so tiny
overfit tests converge quickly.
"""
import os
import wave

import h5py
import numpy as np


def make_shd_h5(
    path: str,
    n: int = 16,
    nb_classes: int = 4,
    nb_units: int = 700,
    max_time: float = 1.4,
    seed: int = 0,
    noise_frac: float = 0.0,
    n_events_range: tuple = (50, 150),
):
    """Create a synthetic SHD-schema HDF5 file. Each class fires a distinct
    block of units so the task is learnable; ``noise_frac`` of the events
    land on uniformly random units, making the task arbitrarily hard."""
    rng = np.random.default_rng(seed)
    vlen_f = h5py.special_dtype(vlen=np.dtype("float64"))
    vlen_i = h5py.special_dtype(vlen=np.dtype("int64"))
    labels = np.arange(n) % nb_classes
    times_list, units_list = [], []
    block = nb_units // nb_classes
    for i in range(n):
        c = labels[i]
        n_events = rng.integers(*n_events_range)
        times = np.sort(rng.uniform(0, max_time * 0.99, n_events))
        units = rng.integers(c * block, (c + 1) * block, n_events)
        if noise_frac > 0.0:
            noisy = rng.random(n_events) < noise_frac
            units = np.where(
                noisy, rng.integers(0, nb_units, n_events), units
            )
        times_list.append(times)
        units_list.append(units.astype(np.int64))
    with h5py.File(path, "w") as f:
        g = f.create_group("spikes")
        dt = g.create_dataset("times", (n,), dtype=vlen_f)
        du = g.create_dataset("units", (n,), dtype=vlen_i)
        for i in range(n):
            dt[i] = times_list[i]
            du[i] = units_list[i]
        f.create_dataset("labels", data=labels.astype(np.int64))
    return labels


def write_wav(path: str, x: np.ndarray, sample_rate: int = 16000):
    """Write float [-1,1] mono audio as 16-bit PCM WAV."""
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def tone(freq: float, dur: float = 0.6, sr: int = 16000, amp: float = 0.5):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def make_hd_tree(root: str, n_per_digit: int = 2, digits=(0, 1)):
    """HD layout: <root>/audio/<name>.wav + train/test filename lists.
    Names follow the reference label rule: digit at index -6 (i.e. the char
    before '.wav' suffix '0.wav'), 'g' at index 5 for German."""
    os.makedirs(os.path.join(root, "audio"), exist_ok=True)
    names = []
    for d in digits:
        for k in range(n_per_digit):
            # Reference label rule: digit at index -6, 'g' at index 5 for
            # German (real HD files are .flac so [-6] is the stem's last
            # char; with .wav we append a filler '0' after the digit).
            name = f"spk{k}_eng_{d}0.wav"
            assert int(name[-6]) == d and name[5] != "g"
            write_wav(
                os.path.join(root, "audio", name),
                tone(300 + 200 * d, dur=0.4 + 0.05 * k),
            )
            names.append(name)
    for split in ("train", "test"):
        with open(os.path.join(root, f"{split}_filenames.txt"), "w") as f:
            f.write("\n".join(names) + "\n")
    return names


def make_sc_tree(root: str, labels=("go", "stop"), n_per_label: int = 3):
    """SC layout: <root>/<label>/*.wav + _background_noise_/ + split lists."""
    os.makedirs(os.path.join(root, "_background_noise_"), exist_ok=True)
    val_list, test_list = [], []
    for li, label in enumerate(labels):
        d = os.path.join(root, label)
        os.makedirs(d, exist_ok=True)
        for k in range(n_per_label):
            name = f"{label}/utt_{k}.wav"
            write_wav(os.path.join(root, name), tone(400 + 300 * li, dur=0.5))
            if k == n_per_label - 1:
                test_list.append(name)
            elif k == n_per_label - 2:
                val_list.append(name)
    with open(os.path.join(root, "validation_list.txt"), "w") as f:
        f.write("\n".join(val_list) + "\n")
    with open(os.path.join(root, "testing_list.txt"), "w") as f:
        f.write("\n".join(test_list) + "\n")
    return labels
