#!/usr/bin/env python3
"""Regenerate BENCH_HISTORY.json from a committed bench detail artifact.

The bench's history-outlier retry trigger (BenchFormat.historyOutliers)
compares each row's run min against the committed calm min recorded here;
regenerate after each round's final calm detail lands so the baseline
tracks the current code:

    python3 tools/make_history.py BENCH_DETAIL_r18.json

Rows absent from the file (new queries) never retry on the rule; errored
rows (-1) are dropped at generation time so a transient failure can never
become a baseline.
"""
import json
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL_r17.json"
    with open(src) as f:
        detail = json.loads(f.readline())
    mins = detail["queries_min"]
    out = {k: v for k, v in sorted(mins.items()) if v >= 0}
    # the baseline is scale-factor-bound: the bench disables the history
    # trigger when its run SF differs from the recorded one
    out["__sf"] = detail["sf"].rstrip("/").rsplit("/", 1)[-1]
    with open("BENCH_HISTORY.json", "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"BENCH_HISTORY.json: {len(out) - 1} rows from {src} "
          f"at {out['__sf']}")


if __name__ == "__main__":
    main()
