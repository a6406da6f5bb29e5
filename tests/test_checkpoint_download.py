"""Offline tests for the checkpoint URL/shortname download-and-cache path
(`inference.load_checkpoint`, matching reference beat_this/inference.py:16-53):
a localhost HTTP server stands in for the GitHub release host, so the
download, atomic cache staging, cache-hit, and failure behaviors are all
exercised with zero egress."""

import threading
from functools import partial
from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import beat_this_tpu.inference as inference_mod
from beat_this_tpu.inference import load_checkpoint, load_model
from beat_this_tpu.io.torch_ckpt import pytree_to_torch_state_dict
from beat_this_tpu.model import BeatThisConfig, init_beat_this


class _QuietHandler(SimpleHTTPRequestHandler):
    def log_message(self, *args):  # no per-request stderr noise
        pass


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """(base_url, docroot) for a throwaway localhost file server with one
    tiny-but-valid checkpoint published as small0.ckpt."""
    docroot = tmp_path_factory.mktemp("release-host")
    cfg = BeatThisConfig(transformer_dim=64, n_layers=1)
    params, state = init_beat_this(3, cfg)
    sd = pytree_to_torch_state_dict(params, state)
    ckpt = {
        "state_dict": {
            "model." + k: torch.as_tensor(np.ascontiguousarray(v))
            for k, v in sd.items()
        },
        "hyper_parameters": {"transformer_dim": 64, "n_layers": 1},
        "pytorch-lightning_version": "2.0.0",
    }
    torch.save(ckpt, docroot / "small0.ckpt")
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), partial(_QuietHandler, directory=str(docroot))
    )
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", docroot
    server.shutdown()
    thread.join(timeout=5)


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    cache = tmp_path / "cache"
    monkeypatch.setattr(inference_mod, "_cache_dir", lambda: cache)
    return cache


def test_url_download_then_cache_hit(served, cache_dir):
    base_url, docroot = served
    url = f"{base_url}/small0.ckpt"
    ckpt = load_checkpoint(url)
    assert "state_dict" in ckpt and ckpt["hyper_parameters"]["n_layers"] == 1
    cached = cache_dir / "small0.ckpt"
    assert cached.exists()
    assert not cached.with_suffix(".tmp").exists()  # staging file renamed
    # second load must come from the cache: remove the served file so any
    # network re-fetch would 404
    (docroot / "small0.ckpt").rename(docroot / "small0.ckpt.hidden")
    try:
        again = load_checkpoint(url)
        assert set(again["state_dict"]) == set(ckpt["state_dict"])
    finally:
        (docroot / "small0.ckpt.hidden").rename(docroot / "small0.ckpt")


def test_shortname_resolves_against_release_host(served, cache_dir, monkeypatch):
    base_url, _ = served
    monkeypatch.setattr(inference_mod, "CHECKPOINT_URL", base_url)
    model = load_model("small0")
    assert model.config.transformer_dim == 64
    # shortname caches under the reference's beat_this-<name>.ckpt scheme
    assert (cache_dir / "beat_this-small0.ckpt").exists()


def test_missing_name_raises_and_caches_nothing(served, cache_dir, monkeypatch):
    base_url, _ = served
    monkeypatch.setattr(inference_mod, "CHECKPOINT_URL", base_url)
    with pytest.raises(ValueError, match="Could not load the checkpoint"):
        load_checkpoint("does_not_exist")
    assert not (cache_dir / "beat_this-does_not_exist.ckpt").exists()
