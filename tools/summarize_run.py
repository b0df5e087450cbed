"""Tabulate a training run's stats.jsonl into a markdown curve table.

Used for the quality-gate archive in BASELINE.md (VERDICT r2 item 7): one
long training run's loss/metric descent, sampled at a handful of kimg
points so the curves fit in a doc.

    python tools/summarize_run.py <run_dir_or_stats.jsonl> [--points 10]
"""

from __future__ import annotations

import argparse
import json
import os


def load(path: str) -> list[dict]:
    if os.path.isdir(path):
        path = os.path.join(path, "stats.jsonl")
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def value(row: dict, key: str):
    v = row.get(key)
    if isinstance(v, dict):
        return v.get("mean")
    return v


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--points", type=int, default=10)
    ap.add_argument("--keys", type=str, default="",
                    help="comma-separated stat names; default: all Loss/* + Metrics/*")
    args = ap.parse_args()

    rows = load(args.path)
    if not rows:
        print("empty stats file")
        return
    if args.keys:
        keys = args.keys.split(",")
    else:
        keys = sorted({
            k for r in rows for k in r
            if k.startswith("Loss/") or k.startswith("Metrics/")
            or k.startswith("Progress/")
        })
    n = len(rows)
    idxs = sorted({round(i * (n - 1) / max(args.points - 1, 1))
                   for i in range(args.points)})

    short = [k.split("/", 1)[-1] for k in keys]
    print("| kimg | " + " | ".join(short) + " |")
    print("|" + "---|" * (len(keys) + 1))
    for i in idxs:
        r = rows[i]
        cells = []
        for k in keys:
            v = value(r, k)
            cells.append(f"{v:.4f}" if isinstance(v, (int, float)) else "-")
        print(f"| {r.get('kimg', i):.1f} | " + " | ".join(cells) + " |")

    # First/best/last summary per key (direction-agnostic: report both).
    print()
    print("| stat | first | last | min | max |")
    print("|---|---|---|---|---|")
    for k in keys:
        series = [value(r, k) for r in rows]
        series = [v for v in series if isinstance(v, (int, float))]
        if not series:
            continue
        print(f"| {k} | {series[0]:.4f} | {series[-1]:.4f} "
              f"| {min(series):.4f} | {max(series):.4f} |")


if __name__ == "__main__":
    main()
