#!/usr/bin/env python3
"""Break the CLI directory-mode mel stage into host / transfer / compute.

VERDICT r4 #2: the log-mel frontend takes 4.4 s for a 32-file group while
the 20M-param model forward takes 2.7 s — yet the DFT-conv is ~1000x fewer
FLOPs than the forward. This tool synthesizes a 32-file corpus matching the
README measurement (11 min of audio, mixed lengths), runs the exact
`BatchedFile2File._batched_spects` recipe, and separates:

  host     _pad_wave_for_mel + np.stack (pure numpy)
  upload   host->device transfer of the padded f32 batch
  compute  the DFT-conv + mel matmul + log1p, data already on device
  download device->host transfer of the full padded mel

plus the end-to-end stacked recipe, a packed-flat prototype (each file
padded to its own bucket count, concatenated along time, ONE (1, total)
conv), and the production `BatchedFile2File._batched_spects` (packed flat
at 4-hop slot granularity since round 5 — the measurement below is WHY:
upload bytes are the whole stage, 50 MB/s through the relay vs 47 ms of
DFT-conv compute, so stacking to the group max pays ~2x the bytes of the
actual audio).

Run on the real TPU: python tools/profile_mel_stage.py
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_corpus(n_files=32, total_sec=660.0, seed=0):
    """Length mix mimicking a music directory: a few long, many mid."""
    rng = np.random.RandomState(seed)
    raw = rng.lognormal(mean=0.0, sigma=0.5, size=n_files)
    secs = raw / raw.sum() * total_sec
    secs = np.clip(secs, 8.0, 65.0)
    sigs = []
    for i, s in enumerate(secs):
        n = int(s * 22050)
        t = np.arange(n) / 22050.0
        x = 0.2 * np.sin(2 * np.pi * (100 + 7 * i) * t)
        x += 0.05 * rng.randn(n)
        sigs.append(x.astype(np.float32))
    return sigs


def main():
    import jax
    import jax.numpy as jnp

    from beat_this_tpu.inference import Audio2Frames, _pad_wave_for_mel
    from beat_this_tpu.ops.mel import LogMelConfig, log_mel_spectrogram
    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    print(f"backend: {jax.devices()[0].platform}")

    sigs = synth_corpus()
    total = sum(len(s) for s in sigs) / 22050.0
    print(f"corpus: {len(sigs)} files, {total:.0f} s audio, "
          f"max {max(len(s) for s in sigs) / 22050.0:.0f} s")

    bucket = Audio2Frames._MEL_BUCKET_SAMPLES

    def reps(fn, n=3, warm=1):
        for _ in range(warm):
            fn()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    # ---- current recipe, staged ----
    max_len = max(len(s) for s in sigs)
    padded_len = max(1, math.ceil(max_len / bucket)) * bucket
    t_host = reps(lambda: np.stack(
        [_pad_wave_for_mel(s, padded_len) for s in sigs]))
    batch = np.stack([_pad_wave_for_mel(s, padded_len) for s in sigs])
    print(f"\nbatched recipe: batch shape {batch.shape} "
          f"({batch.nbytes / 1e6:.0f} MB up)")
    print(f"  host pad+stack : {t_host * 1000:8.0f} ms")

    def upload():
        d = jax.device_put(batch)
        jax.device_get(d[0, :1])  # force the round trip
        return d

    t_up = reps(upload)
    print(f"  upload         : {t_up * 1000:8.0f} ms "
          f"({batch.nbytes / 1e6 / t_up:.0f} MB/s)")

    dev_batch = jax.device_put(batch)
    melfn = jax.jit(lambda x: log_mel_spectrogram(x, LogMelConfig()))
    # compute only: reduce output to a scalar so download cost is excluded
    probe = jax.jit(lambda x: jnp.sum(melfn(x), dtype=jnp.float32))
    t_compute = reps(lambda: jax.device_get(probe(dev_batch)))
    print(f"  compute (sum)  : {t_compute * 1000:8.0f} ms")

    out_dev = melfn(dev_batch)
    out_np = np.asarray(jax.device_get(out_dev))
    t_down = reps(lambda: jax.device_get(out_dev))
    print(f"  download       : {t_down * 1000:8.0f} ms "
          f"({out_np.nbytes / 1e6:.0f} MB, "
          f"{out_np.nbytes / 1e6 / t_down:.0f} MB/s)")

    def end_to_end():
        b = np.stack([_pad_wave_for_mel(s, padded_len) for s in sigs])
        return np.asarray(log_mel_spectrogram(jnp.asarray(b), LogMelConfig()))

    t_e2e = reps(end_to_end)
    print(f"  end-to-end     : {t_e2e * 1000:8.0f} ms")

    # ---- packed-flat variant: per-file bucket counts, one (1, total) conv
    starts, flats = [], []
    pos = 0
    for s in sigs:
        nb = max(1, math.ceil((len(s) + 1024) / bucket))
        flats.append(_pad_wave_for_mel(s, nb * bucket))
        starts.append(pos)
        pos += nb * bucket
    flat = np.concatenate(flats)
    # write each file's reflect-head into the previous file's zero tail so
    # the global conv sees the same 512-sample left context the per-file
    # reflect padding provides
    for s, st in zip(sigs, starts):
        if st >= 512:
            head = s[1:513][::-1]
            flat[st - 512 : st] = head
    print(f"\npacked-flat variant: {flat.nbytes / 1e6:.0f} MB up "
          f"({flat.nbytes / batch.nbytes:.2f}x of batched)")

    def flat_e2e():
        m = log_mel_spectrogram(jnp.asarray(flat), LogMelConfig())
        return np.asarray(m)

    t_flat = reps(flat_e2e)
    print(f"  end-to-end     : {t_flat * 1000:8.0f} ms")

    # parity vs the batched recipe on the first file's true frames
    from beat_this_tpu.ops.mel import num_frames
    m_flat = flat_e2e()
    for i, (s, st) in enumerate(zip(sigs[:4], starts[:4])):
        f0 = st // 441
        nf = num_frames(len(s))
        a = out_np[i, :nf]
        b = m_flat[f0 : f0 + nf]
        d = np.max(np.abs(a - b))
        print(f"  file {i}: max |batched - flat| over {nf} frames = {d:.2e}")

    # ---- the production recipe (BatchedFile2File._batched_spects) ----
    from beat_this_tpu.inference import BatchedFile2File

    f2f = BatchedFile2File.__new__(BatchedFile2File)  # no model needed
    prod_bytes = 4 * sum(
        math.ceil((len(s) + 1024) / (441 * 4)) * 441 * 4 for s in sigs
    )
    print(f"\nproduction _batched_spects: ~{prod_bytes / 1e6:.0f} MB up "
          f"({prod_bytes / batch.nbytes:.2f}x of stacked)")
    t_prod = reps(lambda: f2f._batched_spects(sigs))
    print(f"  end-to-end     : {t_prod * 1000:8.0f} ms")
    m_prod = f2f._batched_spects(sigs)
    worst = max(
        float(np.max(np.abs(out_np[i, : len(m)] - m)))
        for i, m in enumerate(m_prod)
    )
    print(f"  max |stacked - production| over all files = {worst:.2e}")


if __name__ == "__main__":
    main()
