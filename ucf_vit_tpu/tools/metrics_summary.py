"""Summarize a training metrics JSONL (trainer.metrics_path).

The trainer writes one JSON record per logged step: {epoch, it, step, loss,
ms_per_it, samples_per_s, ...task aux...}. This tool turns that stream into
step-time statistics and a loss trend — the offline half of the observability
subsystem (the reference has print-only logging, SURVEY.md §5).

Usage: python -m ucf_vit_tpu.tools.metrics_summary <metrics.jsonl> [--last N]
"""

from __future__ import annotations

import argparse
import json


def summarize(path: str, last: int | None = None) -> dict:
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    if last:
        recs = recs[-last:]
    if not recs:
        return {"records": 0}

    def stats(key):
        vals = sorted(float(r[key]) for r in recs if key in r)
        if not vals:
            return None
        n = len(vals)
        return {
            "mean": sum(vals) / n,
            "p50": vals[n // 2],
            "p90": vals[int(n * 0.9)],
            "max": vals[-1],
        }

    losses = [float(r["loss"]) for r in recs if "loss" in r]
    k = max(len(losses) // 10, 1)
    out = {
        "records": len(recs),
        "epochs": sorted({int(r["epoch"]) for r in recs if "epoch" in r}),
        "ms_per_it": stats("ms_per_it"),
        "samples_per_s": stats("samples_per_s"),
        "loss_first10pct": sum(losses[:k]) / k if losses else None,
        "loss_last10pct": sum(losses[-k:]) / k if losses else None,
    }
    # validation records (trainer.val_every) interleave with step records
    val = [float(r["val_loss"]) for r in recs if "val_loss" in r]
    if val:
        out["val_loss_first"] = val[0]
        out["val_loss_last"] = val[-1]

    # goodput accounting from run_start markers + per-record timestamps:
    # restarts, downtime between runs (last record of run N -> run N+1's
    # marker: the preempt/requeue/compile window), and goodput = productive
    # step time / total wall span. Mid-epoch resume makes a restart cost
    # only this downtime — no batches are re-trained (resume_it in the
    # marker says where each run picked up).
    starts = [r for r in recs if r.get("run_start")]
    if starts and any("ts" in r for r in recs):
        runs = len(starts)
        productive_s = sum(
            float(r["ms_per_it"]) for r in recs if "ms_per_it" in r
        ) / 1e3
        ts_all = [float(r["ts"]) for r in recs if "ts" in r]
        span_s = max(ts_all) - min(ts_all)
        downtime_s = 0.0
        prev_ts = None
        for r in recs:
            if r.get("run_start") and prev_ts is not None:
                downtime_s += max(0.0, float(r["ts"]) - prev_ts)
            if "ts" in r:
                prev_ts = float(r["ts"])
        out["goodput"] = {
            "runs": runs,
            "restarts": runs - 1,
            "resume_points": [
                {"epoch": int(r.get("resume_epoch", 0)),
                 "it": int(r.get("resume_it", 0)),
                 "step": int(r.get("resume_step", 0))}
                for r in starts
            ],
            "productive_s": round(productive_s, 3),
            "restart_downtime_s": round(downtime_s, 3),
            "span_s": round(span_s, 3),
            "goodput_pct": (
                round(100.0 * productive_s / span_s, 2) if span_s > 0
                else None
            ),
        }
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("metrics_path")
    parser.add_argument("--last", type=int, default=None,
                        help="only the last N records")
    args = parser.parse_args(argv)
    out = summarize(args.metrics_path, args.last)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
