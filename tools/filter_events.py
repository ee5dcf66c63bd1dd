#!/usr/bin/env python
"""Post-process a metrics.json event file (equivalent of the reference
projects/WSL/tools/filter_events.py): filter keys by prefix, report
best/last values, optionally re-emit a reduced json."""

import argparse
import json
from collections import defaultdict


def main():
    p = argparse.ArgumentParser()
    p.add_argument("metrics_json")
    p.add_argument("--keys", nargs="*", default=[],
                   help="only keys containing any of these substrings")
    p.add_argument("--out", default="", help="write filtered records here")
    args = p.parse_args()

    records = []
    with open(args.metrics_json) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))

    def keep(k):
        return not args.keys or any(s in k for s in args.keys)

    series = defaultdict(list)
    for r in records:
        it = r.get("iteration", -1)
        for k, v in r.items():
            if k != "iteration" and keep(k) and isinstance(v, (int, float)):
                series[k].append((it, v))

    for k in sorted(series):
        vals = [v for _, v in series[k]]
        last_it, last = series[k][-1]
        print(f"{k:40s} n={len(vals):5d} last={last:.5g} (it {last_it})  "
              f"min={min(vals):.5g} max={max(vals):.5g}")

    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                slim = {k: v for k, v in r.items()
                        if k == "iteration" or keep(k)}
                f.write(json.dumps(slim) + "\n")


if __name__ == "__main__":
    main()
