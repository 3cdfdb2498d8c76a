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
        "epochs": sorted({int(r.get("epoch", 0)) for r in recs}),
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
