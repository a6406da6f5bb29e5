"""The driver entry points keep working: multichip training dry run."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_dryrun_multichip_two_devices():
    import __graft_entry__ as graft

    graft.dryrun_multichip(2)


def test_dryrun_forces_xla_path_on_cpu_mesh(monkeypatch):
    """Regression: with a (possibly broken) TPU as the default backend the
    kernel gate reports True, but the dryrun's mesh is CPU — the dryrun must
    force the XLA path or the Pallas kernels fail to lower for CPU."""
    import __graft_entry__ as graft
    from beat_this_tpu.model import layers

    import functools
    import os

    monkeypatch.delenv("BEAT_THIS_NO_FLASH", raising=False)

    @functools.lru_cache(maxsize=1)
    def fake_flash_enabled():
        # like the real gate, but pretends the platform probe saw a TPU
        return not os.environ.get("BEAT_THIS_NO_FLASH")

    monkeypatch.setattr(layers, "_flash_enabled", fake_flash_enabled)
    graft.dryrun_multichip(2)
    layers._flash_enabled.cache_clear()


def test_entry_signature():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    assert callable(fn) and len(args) == 3
    # full compile of the flagship model is the driver's job; here we only
    # check the example args are shaped for the 1500-frame chunk contract
    assert args[2].shape == (1, 1500, 128)
