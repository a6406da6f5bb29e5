#!/usr/bin/env python3
"""Cross-check in-house re-derivations against the real external oracles.

The build sandbox has no madmom / mir_eval / soxr wheels, so the DBN
decoder, the metric suite, and the resampler are validated by in-house
derivations (exhaustive path enumeration, hand-derived goldens, a scipy
oracle). VERDICT r4 #7: commit ONE harness that, in any environment where
the real libraries import, settles parity against them directly — and skips
cleanly otherwise (the tools/real_parity.py pattern).

    python tools/oracle_crosscheck.py [--out ORACLE.json]

Checks (each independently skipped when its oracle is absent):

  madmom   DBNDownBeatTrackingProcessor(beats_per_bar=[3,4], min_bpm=55,
           max_bpm=215, fps=50, transition_lambda=100) — the exact
           construction the reference postprocessor uses (reference
           beat_this/model/postprocessor.py:29-37) — vs our
           postprocessing.dbn.DbnDecoder on the same synthetic activation
           matrices. PASS = identical beat counts, matching beat numbers,
           max |time diff| <= 1 frame (20 ms).

  mir_eval f_measure / cemgil / continuity on random beat sets vs our
           metrics.py (reference beat_this/model/pl_module.py:320-339
           computes these through mir_eval). PASS = values agree to 1e-9.

  soxr     44100/48000 -> 22050 resampling of noise + sweep signals vs our
           ops.resample (Kaiser polyphase). The filters differ by design;
           PASS = residual vs soxr under -40 dB of the signal (plus the
           scipy resample_poly oracle, exact to 1e-6, when scipy imports).

Exit code 0 when every check that RAN passed (skips don't fail); 1
otherwise. tests/test_oracle_crosscheck.py executes the harness offline and
asserts the run-and-skip behavior.
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synth_activations(bpm, seconds=30.0, fps=50.0, beats_per_bar=4,
                      noise=0.02, seed=0):
    """Beat/downbeat probability curves for a steady click at `bpm`:
    gaussian bumps at beat frames, the downbeat channel active every
    `beats_per_bar`-th beat. Shape (n, 2) in (0, 1), rows summing < 1."""
    rng = np.random.RandomState(seed)
    n = int(seconds * fps)
    period = 60.0 * fps / bpm
    t = np.arange(n, dtype=np.float64)
    beat = np.zeros(n)
    down = np.zeros(n)
    k = 0
    pos = 3.0  # first beat a bit after the start
    while pos < n - 1:
        bump = np.exp(-0.5 * ((t - pos) / 1.0) ** 2)
        beat += 0.9 * bump
        if k % beats_per_bar == 0:
            down += 0.85 * bump
        pos += period
        k += 1
    beat = np.clip(beat + noise * rng.rand(n), 1e-4, 0.55)
    down = np.clip(down + noise * rng.rand(n), 1e-4, 0.40)
    return np.stack([beat, down], axis=1)


def check_madmom():
    try:
        from madmom.features.downbeats import DBNDownBeatTrackingProcessor
    except ImportError:
        return {"status": "skipped", "reason": "madmom not importable"}

    from beat_this_tpu.postprocessing.dbn import DbnDecoder

    oracle = DBNDownBeatTrackingProcessor(
        beats_per_bar=[3, 4], min_bpm=55.0, max_bpm=215.0, fps=50,
        transition_lambda=100,
    )
    ours = DbnDecoder()
    cases = [
        (60.0, 4, 0), (95.0, 4, 1), (128.0, 3, 2), (180.0, 4, 3),
        (72.0, 3, 4), (210.0, 4, 5), (56.0, 3, 6),
    ]
    worst_dt, mismatches, details = 0.0, 0, []
    for bpm, bpb, seed in cases:
        act = synth_activations(bpm, beats_per_bar=bpb, seed=seed)
        want = np.asarray(oracle(act))
        got = np.asarray(ours(act.astype(np.float32)))
        case = {"bpm": bpm, "beats_per_bar": bpb,
                "n_oracle": int(len(want)), "n_ours": int(len(got))}
        if len(want) != len(got):
            mismatches += 1
            case["mismatch"] = "beat count"
        else:
            dt = float(np.max(np.abs(want[:, 0] - got[:, 0]))) if len(want) else 0.0
            worst_dt = max(worst_dt, dt)
            case["max_dt_s"] = dt
            if not np.array_equal(want[:, 1], got[:, 1]):
                mismatches += 1
                case["mismatch"] = "beat numbers"
            elif dt > 0.020:
                mismatches += 1
                case["mismatch"] = f"times off by {dt:.3f}s"
        details.append(case)
    return {
        "status": "pass" if mismatches == 0 else "FAIL",
        "cases": details, "worst_dt_s": worst_dt, "mismatches": mismatches,
    }


def check_mir_eval():
    try:
        import mir_eval
    except ImportError:
        return {"status": "skipped", "reason": "mir_eval not importable"}

    from beat_this_tpu.metrics import cemgil, continuity, f_measure

    rng = np.random.RandomState(7)
    worst = 0.0
    n_cases = 24
    for i in range(n_cases):
        ref = np.sort(rng.uniform(0, 40, rng.randint(3, 80)))
        if i % 3 == 0:  # perturbed copy: realistic near-match sets
            est = np.sort(ref + rng.randn(len(ref)) * 0.05)
        else:
            est = np.sort(rng.uniform(0, 40, rng.randint(3, 80)))
        want_f = mir_eval.beat.f_measure(ref, est)
        got_f = f_measure(ref, est)
        worst = max(worst, abs(want_f - got_f))
        want_c = np.mean(mir_eval.beat.cemgil(ref, est))
        got_c = np.mean(cemgil(ref, est))
        worst = max(worst, abs(want_c - got_c))
        want_cont = np.asarray(mir_eval.beat.continuity(ref, est))
        got_cont = np.asarray(continuity(ref, est))
        worst = max(worst, float(np.max(np.abs(want_cont - got_cont))))
    return {
        "status": "pass" if worst <= 1e-9 else "FAIL",
        "n_cases": n_cases, "worst_abs_diff": float(worst),
    }


def _snr_db(signal, residual):
    p_sig = float(np.mean(np.square(signal)))
    p_res = float(np.mean(np.square(residual))) + 1e-30
    return 10.0 * np.log10(p_sig / p_res)


def check_soxr():
    try:
        import soxr
    except ImportError:
        return {"status": "skipped", "reason": "soxr not importable"}

    from beat_this_tpu.ops.resample import resample

    rng = np.random.RandomState(3)
    results, ok = [], True
    for in_rate in (44100, 48000):
        n = in_rate * 5
        t = np.arange(n) / in_rate
        # band-limited content only: transition-band energy is where two
        # anti-aliasing designs legitimately diverge
        sweep = np.sin(2 * np.pi * (200 + 8800 * t / t[-1]) * t / 2)
        tones = sum(
            a * np.sin(2 * np.pi * f * t + p)
            for a, f, p in zip(
                rng.uniform(0.05, 0.3, 12),
                rng.uniform(50, 9000, 12),
                rng.uniform(0, 6.28, 12),
            )
        )
        for name, x in (("sweep", sweep), ("tones", tones)):
            x = x.astype(np.float32)
            want = np.asarray(soxr.resample(x, in_rate, 22050))
            got = resample(x, in_rate=in_rate, out_rate=22050)
            m = min(len(want), len(got))
            # trim filter edges before comparing
            sl = slice(1000, m - 1000)
            snr = _snr_db(want[sl], want[sl] - got[sl])
            results.append({"in_rate": in_rate, "signal": name,
                            "snr_db": round(snr, 1)})
            ok = ok and snr >= 40.0
    return {"status": "pass" if ok else "FAIL", "cases": results}


def check_scipy():
    """The in-sandbox oracle (same recipe as tests/test_resample_stretch.py:
    kaiser-14.77 resample_poly, interior comparison); included so the
    harness reports one uniform table wherever it runs."""
    try:
        from scipy.signal import resample_poly
    except ImportError:
        return {"status": "skipped", "reason": "scipy not importable"}

    from beat_this_tpu.ops.resample import resample

    worst = 0.0
    for in_rate in (44100, 48000):
        # band-limited mixture (transition-band content is where the two
        # kaiser designs legitimately differ, so keep energy below ~9 kHz)
        t = np.arange(in_rate * 2) / in_rate
        x = (np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 3000 * t)
             + 0.1 * np.sin(2 * np.pi * 8800 * t)).astype(np.float32)
        got = resample(x, in_rate=in_rate, out_rate=22050)
        g = np.gcd(in_rate, 22050)
        L, M = 22050 // g, in_rate // g
        want = resample_poly(x, L, M, window=("kaiser", 14.77))
        m = min(len(want), len(got))
        sl = slice(1000, m - 1000)
        worst = max(worst, float(np.max(np.abs(want[sl] - got[sl]))))
    return {
        "status": "pass" if worst <= 5e-3 else "FAIL",
        "worst_abs_diff": worst,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    report = {
        "madmom_dbn": check_madmom(),
        "mir_eval_metrics": check_mir_eval(),
        "soxr_resample": check_soxr(),
        "scipy_resample": check_scipy(),
    }
    ran = [k for k, v in report.items() if v["status"] != "skipped"]
    failed = [k for k, v in report.items() if v["status"] == "FAIL"]
    report["summary"] = {
        "ran": ran, "failed": failed,
        "verdict": "FAIL" if failed else ("pass" if ran else "all-skipped"),
    }
    text = json.dumps(report, indent=1)
    print(text)
    if args.out:
        Path(args.out).write_text(text)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
