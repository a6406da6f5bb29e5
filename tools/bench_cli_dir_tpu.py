#!/usr/bin/env python3
"""Time the CLI's directory mode end to end on the real TPU, plus a staged
breakdown of one group.

Reproduces the README "CLI directory mode" measurement: 32 synthetic wav
files (~11 min of audio, mixed lengths, the profile_mel_stage corpus
written to disk), a flagship-geometry checkpoint, and TWO `cli.run()`
invocations with --batch-files 32 — the first pays executable-cache
loading through the relay, the second is the warm number the README
quotes. The staged leg times load / mel / forward / postprocess via the
same BatchedFile2File components `process_many` composes, so regressions
are attributable to a stage.

Reference measurement being compared: one-file-at-a-time torch CLI,
/root/reference/beat_this/cli.py:177-191.

Run on the real TPU: python tools/bench_cli_dir_tpu.py [--files 32]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_mel_stage import synth_corpus  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args()

    import torch

    from beat_this_tpu.io.audio import save_wav
    from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict
    from beat_this_tpu.model import BeatThisConfig, init_beat_this
    from beat_this_tpu.profiler import maybe_enable_compilation_cache

    maybe_enable_compilation_cache(
        default_dir=os.path.expanduser("~/.cache/beat_this_tpu/xla-cache")
    )

    tmp = tempfile.mkdtemp(prefix="bench_cli_dir_")
    wavs = os.path.join(tmp, "wavs")
    os.makedirs(wavs)
    sigs = synth_corpus(n_files=args.files)
    total_sec = sum(len(s) for s in sigs) / 22050.0
    for i, s in enumerate(sigs):
        save_wav(os.path.join(wavs, f"f{i:03d}.wav"), s, 22050)
    print(f"corpus: {args.files} files, {total_sec:.0f} s audio, on disk")

    cfg = BeatThisConfig(transformer_dim=args.dim, n_layers=args.layers)
    params, state = init_beat_this(0, cfg)
    sd = pytree_to_torch_state_dict(params, state)
    ckpt = os.path.join(tmp, "m.ckpt")
    torch.save(
        {
            "state_dict": {
                "model." + k: torch.as_tensor(np.ascontiguousarray(v))
                for k, v in sd.items()
            },
            "hyper_parameters": {
                "transformer_dim": args.dim,
                "n_layers": args.layers,
            },
        },
        ckpt,
    )

    from beat_this_tpu.cli import run

    def cli_once(outdir):
        t0 = time.perf_counter()
        run(
            inputs=[wavs], model=ckpt, output=outdir, suffix=".beats",
            append=False, skip_existing=False, touch_first=False, dbn=False,
            gpu=0, float16=False, activations=False,
            batch_files=args.files,
        )
        return time.perf_counter() - t0

    t_cold = cli_once(os.path.join(tmp, "out_cold"))
    print(f"cli run 1 (cold caches): {t_cold:7.1f} s")
    t_warm = cli_once(os.path.join(tmp, "out_warm"))
    n_out = len(os.listdir(os.path.join(tmp, "out_warm")))
    print(f"cli run 2 (warm)       : {t_warm:7.1f} s "
          f"({total_sec / t_warm:.1f}x end to end, {n_out} outputs)")

    # ---- staged breakdown of one warm group ----
    from beat_this_tpu.inference import BatchedFile2File

    f2f = BatchedFile2File(ckpt, group_size=args.files)
    paths = sorted(os.path.join(wavs, p) for p in os.listdir(wavs))

    t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor() as pool:
        signals = list(pool.map(f2f._load_one, paths))
    t_load = time.perf_counter() - t0

    for _ in range(2):  # warm, then measure
        t0 = time.perf_counter()
        spects = f2f._batched_spects(signals)
        t_mel = time.perf_counter() - t0

    for _ in range(2):
        t0 = time.perf_counter()
        results = f2f.predictor.predict_many(spects)
        t_fwd = time.perf_counter() - t0

    from beat_this_tpu.inference import _pad_logit_group

    for _ in range(2):
        t0 = time.perf_counter()
        f2f.frames2beats(*_pad_logit_group(results))
        t_post = time.perf_counter() - t0

    print(f"staged (warm): load {t_load:.1f} s, mel {t_mel:.1f} s, "
          f"forward {t_fwd:.1f} s, postprocess {t_post:.1f} s")

    # the production group path: flat mel stays device-resident, windows
    # gathered on device — signal -> logits without the spect round trip
    for _ in range(2):
        t0 = time.perf_counter()
        dev_results = f2f._group_logits(signals)
        t_grp = time.perf_counter() - t0
    print(f"device-resident signals->logits (warm): {t_grp:.1f} s "
          f"(host-path mel+forward: {t_mel + t_fwd:.1f} s)")

    # the two paths feed the same cached executables with identically
    # constructed tensors, so at the REAL flagship geometry on the real
    # TPU their logits must agree bitwise (the CPU suite asserts this at
    # small geometry; this run re-proves it where it is deployed)
    worst = max(
        max(
            float(np.max(np.abs(db - hb))),
            float(np.max(np.abs(dd - hd))),
        )
        for (db, dd), (hb, hd) in zip(dev_results, results)
    )
    print(f"device-vs-host logit agreement: max|d| = {worst:.2e}")
    assert worst == 0.0, "device-resident path diverged from host path"


if __name__ == "__main__":
    main()
