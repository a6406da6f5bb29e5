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
    parser = argparse.ArgumentParser(
        description="Detects beats in given audio files with a Beat This! model."
    )
    parser.add_argument(
        "inputs", type=str, nargs="+",
        help="An audio file to process, or a directory of such files. "
             "Can be given multiple times.",
    )
    parser.add_argument(
        "--model", type=str, default="final0",
        help="Name, path or URL of checkpoint to use, will be downloaded if "
             "needed (default: %(default)s).",
    )
    parser.add_argument(
        "--output", "-o", type=str, default=None,
        help="Output file name for a single input file, or output directory "
             "for multiple input files. If omitted, outputs are saved next to "
             "each input file by replacing or appending a suffix (see "
             "--suffix and --append).",
    )
    parser.add_argument(
        "--suffix", "-s", type=str, default=".beats",
        help="Suffix for output file names (default: %(default)s). Also see "
             "--append. Ignored if an explicit output file name is given.",
    )
    parser.add_argument(
        "--append", action="store_true",
        help="If given, append suffix to output file names instead of "
             "replacing the existing suffix. Ignored if an explicit output "
             "file name is given.",
    )
    parser.add_argument(
        "--skip-existing", action="store_true",
        help="If given, do not overwrite existing output files, but skip them.",
    )
    parser.add_argument(
        "--touch-first", action="store_true",
        help="If given, create empty output file before processing. Combined "
             "with --skip-existing, allows to run multiple processes in "
             "parallel on the same set of files.",
    )
    parser.add_argument(
        "--dbn", default=False, action=argparse.BooleanOptionalAction,
        help="Use the DBN (Viterbi) postprocessor instead of peak picking.",
    )
    parser.add_argument(
        "--gpu", type=int, default=0,
        help="Accepted for compatibility with the reference CLI; device "
             "placement is controlled by JAX (TPU if available), -1 forces "
             "CPU. (default: %(default)s)",
    )
    parser.add_argument(
        "--float16", action="store_true",
        help="If given, uses bfloat16 arithmetic (TPU-native half precision).",
    )
    parser.add_argument(
        "--activations", action="store_true",
        help="If given, saves the raw activations with a .npy suffix.",
    )
    parser.add_argument(
        "--batch-files", type=int, default=8,
        help="When processing multiple files, batch this many through the "
             "accelerator at once (default: %(default)s; 1 disables batching).",
    )
    return parser


def derive_output_path(input_path, suffix, append, output=None, parent=None):
    """Output path derivation, same rules as the reference
    (beat_this/cli.py:92-111)."""
    if output is None:
        output_path = input_path
    else:
        if parent is not None:
            input_path = input_path.relative_to(parent)
        else:
            input_path = input_path.name
        output_path = output / input_path
    if append:
        return output_path.parent / (output_path.name + suffix)
    return output_path.with_suffix(suffix)


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
        # the live config rather than the environment
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

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

        def process(audiofile, outfile):
            wav, sr = load_audio(audiofile)
            spect = file2file.signal2spect(wav, sr)
            beat_logits, downbeat_logits = file2file.spect2frames(spect)
            np.save(
                Path(outfile).with_suffix(".npy"),
                np.vstack([beat_logits, downbeat_logits]),
            )
            beats, downbeats = file2file.frames2beats(beat_logits, downbeat_logits)
            save_beat_tsv(beats, downbeats, outfile)

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
        # collect tasks first for a progress bar
        tasks = []
        for item in inputs:
            if item.is_dir():
                for fn in item.rglob("*"):
                    if not fn.name.endswith(suffix) and not fn.is_dir():
                        output_path = derive_output_path(
                            fn, suffix, append, output, parent=item
                        )
                        if not skip_existing or not output_path.exists():
                            tasks.append((fn, output_path))
            else:
                tasks.append((item, derive_output_path(item, suffix, append, output)))
        # claim files up front (atomic multi-process sharding)
        claimed = []
        for item, outfile in tasks:
            if touch_first:
                try:
                    outfile.parent.mkdir(parents=True, exist_ok=True)
                    outfile.touch(exist_ok=not skip_existing)
                except FileExistsError:
                    continue
            elif skip_existing and outfile.exists():
                continue
            claimed.append((item, outfile))

        progress = tqdm.tqdm(total=len(claimed)) if tqdm is not None else None

        def on_error(item, exc):
            print(
                f'Could not process "{item}". Rerun with this file alone '
                "for details.",
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
