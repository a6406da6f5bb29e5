#!/usr/bin/env python3
"""Compare raw activation dumps between this stack and the reference.

The documented parity procedure (SURVEY.md §6, BASELINE.md): run the same
audio through both CLIs with `--activations` and diff the framewise logits:

    # reference stack
    beat_this song.wav -o ref_out/song.beats --activations
    # this stack
    python -m beat_this_tpu.cli song.wav -o tpu_out/song.beats --activations
    # compare
    python launch_scripts/compare_activations.py ref_out tpu_out

Both dumps are (2, frames) float arrays of [beat; downbeat] logits
(reference: beat_this/cli.py:136-146). Prints per-file and aggregate max/mean
absolute differences and fails (exit 1) if the max difference exceeds the
tolerance.
"""

import argparse
import sys
from pathlib import Path

import numpy as np


def compare(ref_dir, test_dir, tolerance):
    ref_dir, test_dir = Path(ref_dir), Path(test_dir)
    ref_files = sorted(ref_dir.rglob("*.npy"))
    if not ref_files:
        print(f"no .npy activation dumps in {ref_dir}", file=sys.stderr)
        return 2
    worst = 0.0
    failed = []
    for ref_file in ref_files:
        test_file = test_dir / ref_file.relative_to(ref_dir)
        if not test_file.exists():
            print(f"MISSING {test_file}")
            failed.append(ref_file.name)
            continue
        a = np.load(ref_file).astype(np.float64)
        b = np.load(test_file).astype(np.float64)
        if a.shape != b.shape:
            print(f"SHAPE MISMATCH {ref_file.name}: {a.shape} vs {b.shape}")
            failed.append(ref_file.name)
            continue
        diff = np.abs(a - b)
        status = "ok" if diff.max() <= tolerance else "FAIL"
        if status == "FAIL":
            failed.append(ref_file.name)
        worst = max(worst, float(diff.max()))
        print(
            f"{status:4s} {ref_file.name}: max {diff.max():.5f} "
            f"mean {diff.mean():.6f}"
        )
    print(f"\nworst max-abs-diff: {worst:.5f} (tolerance {tolerance})")
    if failed:
        print(f"{len(failed)} file(s) out of tolerance")
        return 1
    print("all activations within tolerance")
    return 0


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("reference_dir", help="directory of reference .npy dumps")
    parser.add_argument("test_dir", help="directory of this stack's .npy dumps")
    parser.add_argument("--tolerance", type=float, default=1e-2,
                        help="max absolute logit difference (default %(default)s)")
    args = parser.parse_args()
    sys.exit(compare(args.reference_dir, args.test_dir, args.tolerance))
