"""Takeover step-time comparison from two runs' events.jsonl.

The distilled light-field emitter cache (serving/distill.py) was measured
at 6.3x the megakernel on the isolated emitter-query bench; this script
reports what that buys END TO END: mean SDF-phase step time (and rays/s)
for the baseline vs distilled arms, split at the volume-upsample step
(the render-res doubling dominates the tail). Rows are the trainer's
10-step writer cadence, so per-row dt/10 approximates the step time.

Usage: steptime.py baseline_events.jsonl distilled_events.jsonl \
          [--upsample-step N] [--output-path out.json]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def sdf_step_times(events_path: str) -> list[tuple[int, float]]:
    rows = [json.loads(line) for line in open(events_path)]
    sdf = [r for r in rows if "view_loss" in r and "ts" in r]
    sdf.sort(key=lambda r: r["step"])
    out = []
    for a, b in zip(sdf, sdf[1:]):
        dsteps = b["step"] - a["step"]
        if dsteps > 0:
            out.append((b["step"], (b["ts"] - a["ts"]) / dsteps))
    return out


def split_mean(times, upsample_step):
    pre = [t for s, t in times if s <= upsample_step]
    post = [t for s, t in times if s > upsample_step]
    mean = lambda xs: sum(xs) / len(xs) if xs else None  # noqa: E731
    return mean(pre), mean(post), mean([t for _, t in times])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("distilled")
    ap.add_argument("--upsample-step", type=int, default=2064)
    ap.add_argument("--output-path", type=Path, default=None)
    args = ap.parse_args(argv)

    out = {"metric": "takeover_sdf_step_seconds", "upsample_step": args.upsample_step}
    for name, path in (("baseline", args.baseline), ("distilled", args.distilled)):
        pre, post, overall = split_mean(
            sdf_step_times(path), args.upsample_step
        )
        out[name] = {
            "pre_upsample_s": pre and round(pre, 3),
            "post_upsample_s": post and round(post, 3),
            "overall_s": overall and round(overall, 3),
        }
    b, d = out["baseline"]["overall_s"], out["distilled"]["overall_s"]
    if b and d:
        out["speedup_overall"] = round(b / d, 3)
    bp, dp = out["baseline"]["post_upsample_s"], out["distilled"]["post_upsample_s"]
    if bp and dp:
        out["speedup_post_upsample"] = round(bp / dp, 3)
    line = json.dumps(out)
    print(line)
    if args.output_path:
        args.output_path.write_text(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
