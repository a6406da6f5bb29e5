#!/usr/bin/env python3
"""Beat This! TPU command-line inference tool.

Drop-in equivalent of the reference `beat_this` console script
(reference: beat_this/cli.py): detects beats/downbeats in audio files or
directories and writes `.beats` TSV files. Flags `--touch-first` /
`--skip-existing` allow sharding a directory across multiple processes or
hosts exactly like the reference; `--float16` selects bfloat16 compute (the
TPU-native half precision); `--activations` dumps raw framewise logits.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

try:
    import tqdm
except ImportError:  # pragma: no cover
    tqdm = None


def get_parser():
    # flag names, types and defaults are a compatibility contract with the
    # reference console script (reference: beat_this/cli.py:22-89)
    parser = argparse.ArgumentParser(
        description="Beat This! beat tracker: writes a .beats TSV "
        "(time<TAB>beat-number) per input audio file."
    )
    parser.add_argument(
        "inputs", type=str, nargs="+",
        help="audio files and/or directories to scan recursively",
    )
    parser.add_argument(
        "--model", type=str, default="final0",
        help="checkpoint to run: a released shortname (fetched and cached on "
             "first use), a local path, or a URL [%(default)s]",
    )
    parser.add_argument(
        "--output", "-o", type=str, default=None,
        help="where results go: a file name (single input) or a base "
             "directory (mirrors the input tree); by default each result "
             "lands beside its input, named per --suffix/--append",
    )
    parser.add_argument(
        "--suffix", "-s", type=str, default=".beats",
        help="extension for derived output names [%(default)s]; has no "
             "effect when --output names a single file",
    )
    parser.add_argument(
        "--append", action="store_true",
        help="keep the input's own extension and add the suffix after it, "
             "rather than substituting it",
    )
    parser.add_argument(
        "--skip-existing", action="store_true",
        help="leave already-present output files untouched",
    )
    parser.add_argument(
        "--touch-first", action="store_true",
        help="claim each output by creating it empty before processing; with "
             "--skip-existing this shards one directory safely across "
             "concurrent processes or hosts",
    )
    parser.add_argument(
        "--dbn", default=False, action=argparse.BooleanOptionalAction,
        help="decode beats with the DBN (Viterbi) postprocessor instead of "
             "peak picking",
    )
    parser.add_argument(
        "--gpu", type=int, default=0,
        help="kept for reference-CLI compatibility; JAX owns device "
             "placement (TPU when present), and -1 forces the CPU backend "
             "[%(default)s]",
    )
    parser.add_argument(
        "--float16", action="store_true",
        help="compute in bfloat16, the TPU-native half precision",
    )
    parser.add_argument(
        "--activations", action="store_true",
        help="also dump the framewise beat/downbeat logits as a .npy file",
    )
    parser.add_argument(
        "--batch-files", type=int, default=8,
        help="files fed through the accelerator per batch when processing "
             "many inputs [%(default)s]; 1 disables batching",
    )
    return parser


def derive_output_path(input_path, suffix, append, output=None, parent=None):
    """Map an input audio path to its output path (same rules as reference
    beat_this/cli.py:92-111).

    Without `output`, results live next to their inputs. With an `output`
    base directory, the input's position relative to the command-line
    directory `parent` (or just its file name, for inputs given directly) is
    re-rooted under `output`. The `suffix` then replaces the extension, or
    with `append` is added after the complete name.
    """
    target = Path(input_path)
    if output is not None:
        rel = target.relative_to(parent) if parent is not None else target.name
        target = Path(output) / rel
    name = target.name + suffix if append else target.stem + suffix
    return target.with_name(name)


def _gather_jobs(inputs, suffix, append, output, skip_existing):
    """Expand the command-line inputs into (audio_path, beats_path) jobs.

    Directories are walked recursively; anything whose name already carries
    the output suffix is not treated as audio. The list is materialized up
    front so directory mode can show a progress bar and feed whole groups
    through the batched predictor. Matches the reference CLI's discovery
    behavior (reference: beat_this/cli.py:161-173).
    """
    jobs = []
    for entry in inputs:
        if not entry.is_dir():
            jobs.append(
                (entry, derive_output_path(entry, suffix, append, output))
            )
            continue
        for candidate in entry.rglob("*"):
            if candidate.is_dir() or candidate.name.endswith(suffix):
                continue
            beats_path = derive_output_path(
                candidate, suffix, append, output, parent=entry
            )
            if skip_existing and beats_path.exists():
                continue
            jobs.append((candidate, beats_path))
    return jobs


def _claim_jobs(jobs, touch_first, skip_existing):
    """Filter jobs to the ones this process owns, claiming output files up
    front when --touch-first is set (atomic multi-process sharding of one
    directory: whoever creates the empty output first wins)."""
    if not touch_first:
        if skip_existing:
            return [job for job in jobs if not job[1].exists()]
        return list(jobs)
    owned = []
    for job in jobs:
        beats_path = job[1]
        try:
            beats_path.parent.mkdir(parents=True, exist_ok=True)
            beats_path.touch(exist_ok=not skip_existing)
        except FileExistsError:
            continue
        owned.append(job)
    return owned


def run(
    inputs,
    model,
    output,
    suffix,
    append,
    skip_existing,
    touch_first,
    dbn,
    gpu,
    float16,
    activations,
    batch_files=8,
):
    if gpu is not None and gpu < 0:
        # force CPU; jax may already be imported (sitecustomize), so update
        # the live config rather than the environment — and fail loudly if
        # the backend was already initialized on an accelerator, instead of
        # silently running there
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        if jax.default_backend() != "cpu":
            raise RuntimeError(
                "--gpu -1 requested the CPU backend, but JAX is already "
                f"initialized on '{jax.default_backend()}'. Set "
                "JAX_PLATFORMS=cpu in the environment before launching."
            )

    from beat_this_tpu.inference import BatchedFile2File
    from beat_this_tpu.io.audio import load_audio
    from beat_this_tpu.profiler import (
        Throughput,
        maybe_enable_compilation_cache,
        maybe_trace,
    )
    from beat_this_tpu.utils import save_beat_tsv

    maybe_enable_compilation_cache()

    file2file = BatchedFile2File(
        model, None, float16, dbn, group_size=max(1, batch_files)
    )
    throughput = Throughput()
    _orig_signal2spect = file2file.signal2spect

    def signal2spect(signal, sr):
        throughput.add(len(signal) / (sr if sr else 22050))
        return _orig_signal2spect(signal, sr)

    file2file.signal2spect = signal2spect
    if activations:

        def process(audio_path, beats_path):
            # the logit dump reuses the same staged pipeline the normal
            # path runs, with the raw framewise activations captured
            # between the forward and the postprocessor
            waveform, sr = load_audio(audio_path)
            logits = file2file.spect2frames(
                file2file.signal2spect(waveform, sr)
            )
            np.save(Path(beats_path).with_suffix(".npy"), np.vstack(logits))
            save_beat_tsv(*file2file.frames2beats(*logits), beats_path)

    else:
        process = file2file

    inputs = [Path(item) for item in inputs]
    if output is not None:
        output = Path(output)
    if len(inputs) == 1 and not inputs[0].is_dir():
        # single input file
        if output is None or output.is_dir():
            output = derive_output_path(inputs[0], suffix, append, output)
        with maybe_trace():
            process(inputs[0], output)
        print(throughput.summary(), file=sys.stderr)
    else:
        jobs = _gather_jobs(inputs, suffix, append, output, skip_existing)
        claimed = _claim_jobs(jobs, touch_first, skip_existing)

        progress = tqdm.tqdm(total=len(claimed)) if tqdm is not None else None

        def on_error(audio_path, exc):
            print(
                f"beat_this_tpu: {audio_path} failed "
                f"({type(exc).__name__}); run it by itself to see the "
                "full traceback.",
                file=sys.stderr,
            )
            if progress is not None:
                progress.update(1)

        def after_each(item, outfile, beat_logits, downbeat_logits):
            throughput.add(len(beat_logits) / 50.0)
            if activations:
                np.save(
                    Path(outfile).with_suffix(".npy"),
                    np.vstack([beat_logits, downbeat_logits]),
                )
            if progress is not None:
                progress.update(1)

        with maybe_trace():
            file2file.process_many(
                claimed, on_error=on_error, after_each=after_each
            )
        if progress is not None:
            progress.close()
        print(throughput.summary(), file=sys.stderr)


def main():
    run(**vars(get_parser().parse_args()))


if __name__ == "__main__":
    sys.exit(main())
