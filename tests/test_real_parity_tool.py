"""End-to-end offline execution of tools/real_parity.py — the committed
one-command north-star protocol (released checkpoints + GTZAN vs the torch
reference, BASELINE.md's "F within 0.001"). Real weights and GTZAN need
egress, but the TOOL's entire glue — checkpoint load, datamodule from
embedded hparams, batched predict + postprocess, per-piece metrics, the
in-process torch reference side, the JSON verdict — runs here on a
synthetic corpus and a random-weight checkpoint shared by both stacks,
where the per-piece F diff must be exactly zero."""

import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parent.parent
REFERENCE_ROOT = Path("/root/reference")
sys.path.insert(0, str(REPO / "tools"))


@pytest.fixture(scope="module")
def parity_setup(tmp_path_factory):
    from tests.test_dataset import make_corpus

    from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict
    from beat_this_tpu.model import BeatThisConfig, init_beat_this

    root = tmp_path_factory.mktemp("gtzan-data")
    # 1700 frames: two 1500-frame chunks with a stitched boundary, the
    # regime the aggregation logic actually has to get right
    make_corpus(root, n_pieces=2, frames=1700, dataset="gtzan",
                augmentations={})

    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(7, cfg)
    # raise the head so random-weight logits cross the peak threshold —
    # otherwise both sides emit zero beats and the dF=0 verdict is vacuous
    params["head"]["w"] = params["head"]["w"] * 4.0
    params["head"]["b"] = params["head"]["b"] + 1.0
    sd = pytree_to_torch_state_dict(params, state)
    ckpt = {
        "state_dict": {
            "model." + k: torch.as_tensor(np.ascontiguousarray(v))
            for k, v in sd.items()
        },
        "hyper_parameters": {"transformer_dim": 64, "n_layers": 1},
        "datamodule_hyper_parameters": {
            "batch_size": 2, "test_dataset": "gtzan",
        },
        "pytorch-lightning_version": "2.0.0",
    }
    path = tmp_path_factory.mktemp("ckpt") / "parity.ckpt"
    torch.save(ckpt, path)
    return root, path


def test_real_parity_tool_runs_the_whole_protocol(parity_setup, tmp_path):
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference checkout not mounted")
    root, ckpt_path = parity_setup
    import real_parity

    out = tmp_path / "PARITY.json"
    args = SimpleNamespace(
        checkpoint=[str(ckpt_path)],
        data_dir=root,
        datasplit="test",
        num_workers=2,
        float16=False,
        reference=str(REFERENCE_ROOT),
        out=str(out),
    )
    results = real_parity.run(args)

    entry = results[str(ckpt_path)]
    assert entry["n_pieces"] == 2
    # same weights through both stacks: per-piece beat times agree, so the
    # per-piece F-measures diff by exactly zero and the verdict is PASS
    assert entry["verdict"] == "PASS", entry
    assert entry["max_abs_piece_dF"] <= 1e-9
    assert entry["beat_F_ours"] is not None
    # non-vacuous: the biased head must actually produce beats (F > 0 means
    # predictions matched some annotation, which random weights won't do
    # reliably — assert instead that the report carries real numbers)
    report = json.loads(out.read_text())
    assert report[str(ckpt_path)]["beat_F_reference"] == pytest.approx(
        entry["beat_F_ours"]
    )
