#!/usr/bin/env python3
"""Strip checkpoints for distribution: keep only the state dict and the
hyperparameters needed to reconstruct the model and datamodule, dropping
optimizer/resume state (equivalent of the reference
launch_scripts/clean_checkpoints.py:17-32)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KEEP_KEYS = (
    "state_dict",
    "hyper_parameters",
    "datamodule_hyper_parameters",
    "pytorch-lightning_version",
)


def main(args):
    from beat_this_tpu.io.torch_ckpt import load_torch_checkpoint
    from beat_this_tpu.io.torch_save import save_torch_checkpoint

    for fn in args.checkpoints:
        fn = Path(fn)
        ckpt = load_torch_checkpoint(fn)
        cleaned = {k: ckpt[k] for k in KEEP_KEYS if k in ckpt}
        # drop non-portable path entries (reference clean_checkpoints.py:28-30)
        cleaned.get("datamodule_hyper_parameters", {}).pop("data_dir", None)
        out = fn.with_suffix(".cleaned.ckpt") if args.suffix else fn
        # tensors in loaded form are numpy arrays already
        sd = cleaned.get("state_dict", {})
        cleaned["state_dict"] = {k: v for k, v in sd.items()}
        save_torch_checkpoint(cleaned, out)
        print(f"wrote {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoints", nargs="+", help="checkpoint files to clean")
    parser.add_argument(
        "--suffix", action="store_true",
        help="write to *.cleaned.ckpt instead of overwriting in place",
    )
    main(parser.parse_args())
