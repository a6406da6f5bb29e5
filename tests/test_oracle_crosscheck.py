"""The external-oracle harness must run end to end offline: absent oracles
(madmom / mir_eval / soxr here) skip cleanly, present ones (scipy) run and
pass — the tools/real_parity.py pattern (VERDICT r4 #7)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_oracle_crosscheck_runs_and_skips(tmp_path):
    out = tmp_path / "oracle.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "oracle_crosscheck.py"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(out.read_text())
    for key in ("madmom_dbn", "mir_eval_metrics", "soxr_resample",
                "scipy_resample", "summary"):
        assert key in report
    # nothing that ran may fail, and skips must carry a reason
    assert report["summary"]["failed"] == []
    for key, entry in report.items():
        if key != "summary" and entry["status"] == "skipped":
            assert "not importable" in entry["reason"]
    # scipy is installed in this environment: the resampler leg must
    # actually RUN here, proving the harness exercises present oracles
    assert report["scipy_resample"]["status"] == "pass"


def test_synth_activations_shape():
    sys.path.insert(0, str(REPO / "tools"))
    from oracle_crosscheck import synth_activations

    act = synth_activations(120.0, seconds=10.0)
    assert act.shape == (500, 2)
    assert float(act.min()) > 0.0
    assert float(act.sum(axis=1).max()) < 1.0
