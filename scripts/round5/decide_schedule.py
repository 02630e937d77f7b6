"""Emitter sample-schedule quality gate (round 5).

The reduced schedule (128, 48, 24) measured 3.94M rays/s (2.63x) on the
megakernel (RESULTS_r03.md) but its end-task quality was never validated
(VERDICT r3 #3, r4 weak #5). This script compares the equal-step
baseline arm (default 256/96/48 schedule) against the reduced-schedule
arm and records the verdict in configs/gates.json
(`emitter_samples_reduced`), same mechanism as decide_distill.py.

Usage:
  decide_schedule.py base_eval.json ab_eval.json base_chamfer.json \
      ab_chamfer.json

Note the reduced schedule only matters as a default when the MEGAKERNEL
serves the emitter; if the distilled cache gate also passed, the
schedule gate is recorded for the megakernel fallback path.

Match: nerfstudio/models/base_model.py:53-58 (the reference's
emitter-sample-count knob).
"""

from __future__ import annotations

import datetime
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from nerf_emitter_tpu.configs.gates import write_gate  # noqa: E402

PSNR_GATE_DB = 0.1
CHAMFER_RATIO_GATE = 1.15


def main(argv):
    base_eval, ab_eval, base_cham, ab_cham = argv[:4]
    base = json.loads(Path(base_eval).read_text())["results"]
    ab = json.loads(Path(ab_eval).read_text())["results"]
    cb = json.loads(Path(base_cham).read_text())["chamfer"]
    ca = json.loads(Path(ab_cham).read_text())["chamfer"]

    dpsnr = base["psnr"] - ab["psnr"]  # positive = reduced is worse
    cham_ratio = ca / max(cb, 1e-12)
    passed = dpsnr < PSNR_GATE_DB and cham_ratio < CHAMFER_RATIO_GATE

    now = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    print(f"\n### Emitter sample-schedule gate decision ({now})\n")
    print("| arm | NVS PSNR | SSIM | chamfer |")
    print("|---|---|---|---|")
    print(
        f"| baseline (256/96/48) | {base['psnr']:.3f} |"
        f" {base.get('ssim', float('nan')):.3f} | {cb:.5f} |"
    )
    print(
        f"| reduced (128/48/24) | {ab['psnr']:.3f} |"
        f" {ab.get('ssim', float('nan')):.3f} | {ca:.5f} |"
    )
    print(
        f"\nΔPSNR (base−reduced) = {dpsnr:+.3f} dB (gate < {PSNR_GATE_DB}),"
        f" chamfer ratio = {cham_ratio:.3f} (gate < {CHAMFER_RATIO_GATE})."
        f" Verdict: **{'PASS' if passed else 'FAIL'}**."
    )
    evidence = (
        f"equal-step A/B: baseline PSNR {base['psnr']:.3f} / chamfer"
        f" {cb:.5f}; reduced PSNR {ab['psnr']:.3f} / chamfer {ca:.5f};"
        f" dPSNR {dpsnr:+.3f} dB, chamfer ratio {cham_ratio:.3f}"
    )
    write_gate(
        "emitter_samples_reduced",
        passed,
        decided_by="scripts/round5/decide_schedule.py",
        evidence=evidence,
        decided_at=now,
    )
    print(
        f"\n`emitter_samples_reduced` gate written"
        f" {'True — (128,48,24) is the sdf-nerfacto default schedule' if passed else 'False — the full 256/96/48 schedule stays default'}"
        " (configs/gates.json)."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
