#!/usr/bin/env python
"""Host data-pipeline throughput for the SC on-the-fly wav->fbank config.

Measures loader-only utterances/sec (batch 128, 1 s clips at 16 kHz,
augmentation on — the heaviest host path: the reference gets parallelism
from torch DataLoader workers, nonspiking_datasets.py:282-289) across
worker counts, so it can be compared against the device train-step rate
of the matching model config (RadLIF 3x1024 bidirectional; see
tools/bench_configs.py). The loader must sustain more utt/s than the
device consumes or the TPU starves.
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from sparch_tpu.data.audio import load_hd_or_sc  # noqa: E402

B = 128
N_UTT = 1024
SR = 16000


def make_sc_tree(root, n=N_UTT, labels=("go", "stop", "left", "right")):
    rng = np.random.default_rng(0)
    import wave

    os.makedirs(os.path.join(root, "_background_noise_"), exist_ok=True)
    val, test = [], []
    for i in range(n):
        lab = labels[i % len(labels)]
        d = os.path.join(root, lab)
        os.makedirs(d, exist_ok=True)
        name = f"{lab}/utt_{i}.wav"
        x = rng.uniform(-0.5, 0.5, SR).astype(np.float32)
        pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
        with wave.open(os.path.join(root, name), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(SR)
            f.writeframes(pcm.tobytes())
        if i % 10 == 8:
            val.append(name)
        elif i % 10 == 9:
            test.append(name)
    with open(os.path.join(root, "validation_list.txt"), "w") as f:
        f.write("\n".join(val) + "\n")
    with open(os.path.join(root, "testing_list.txt"), "w") as f:
        f.write("\n".join(test) + "\n")


def bench(root, workers, frontend="host"):
    loader = load_hd_or_sc(
        "sc", root, "train", batch_size=B, shuffle=True, use_augm=True,
        min_snr=1e-4, max_snr=0.9, p_noise=0.1, workers=workers,
        pad_multiple=100, frontend=frontend,
    )
    try:
        # warm epoch (pool startup, fbank table caches)
        n = 0
        for x, lens, y in loader:
            n += len(y)
        t0 = time.perf_counter()
        n = 0
        for x, lens, y in loader:
            n += len(y)
        dt = time.perf_counter() - t0
        return n / dt
    finally:
        loader.close()


def main():
    with tempfile.TemporaryDirectory() as root:
        print(f"generating {N_UTT} 1 s clips...", flush=True)
        make_sc_tree(root)
        for frontend in ("host", "device"):
            for workers in (0, 2, 4, 8, 16):
                rate = bench(root, workers, frontend)
                print(
                    f"frontend={frontend:6s} workers={workers:2d}: "
                    f"{rate:8.0f} utt/s ({rate / B:6.1f} batches/s)",
                    flush=True,
                )


if __name__ == "__main__":
    main()
