"""Multi-host data parallelism: a 2-process x 4-device CPU run through
`jax.distributed.initialize` + per-host batch feeding must produce the same
losses as a single-process 8-device mesh over the same global batches
(SURVEY §2.3 TPU mapping: "DP scales across chips/hosts (DCN)")."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from beat_this_tpu.data.synth import write_click_corpus

REPO = Path(__file__).resolve().parent.parent
WORKER = REPO / "tests" / "multihost_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _base_env(local_devices):
    env = {k: v for k, v in os.environ.items()
           if k not in ("BEAT_THIS_COORDINATOR", "BEAT_THIS_NUM_PROCESSES",
                        "BEAT_THIS_PROCESS_ID", "BEAT_THIS_DISTRIBUTED")}
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    env["PYTHONPATH"] = str(REPO)
    return env


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    write_click_corpus(tmp_path, n_pieces=8, n_val_pieces=1, frames=128)

    # reference: single process, 8 local devices
    single_out = tmp_path / "single.json"
    subprocess.run(
        [sys.executable, str(WORKER), str(tmp_path), str(single_out)],
        env=_base_env(8), check=True, timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    single = json.loads(single_out.read_text())
    assert single["global_devices"] == 8
    assert single["step"] == 2

    # 2 processes x 4 devices over a shared coordinator
    port = _free_port()
    procs, outs = [], []
    for pid in (0, 1):
        env = _base_env(4)
        env["BEAT_THIS_COORDINATOR"] = f"127.0.0.1:{port}"
        env["BEAT_THIS_NUM_PROCESSES"] = "2"
        env["BEAT_THIS_PROCESS_ID"] = str(pid)
        out = tmp_path / f"multi{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(tmp_path), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    multi = [json.loads(o.read_text()) for o in outs]
    for m in multi:
        assert m["process_count"] == 2
        assert m["global_devices"] == 8
        assert m["step"] == 2
    # both processes observe identical (replicated) losses...
    np.testing.assert_allclose(multi[0]["losses"], multi[1]["losses"],
                               rtol=1e-6)
    # ...equal to the single-process run over the same global batches
    np.testing.assert_allclose(multi[0]["losses"], single["losses"],
                               rtol=2e-4)
