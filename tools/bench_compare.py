"""Per-entry bench regression GATE (round-5 verdict #5) — compares two
bench outputs and fails the close ritual when an entry got structurally
slower round-over-round.

Usage:
    python tools/bench_compare.py OLD.json NEW.json \
        [--threshold 1.5] [--waive name1,name2]

Accepts both the raw one-line bench.py output and the driver's wrapped
`BENCH_r{N}.json` ({"parsed": {...}}). Old times are NORMALIZED by the
calibration ratio (new stream_calibration_sec / old) before comparing —
the calibration replay is a fixture-independent floor measurement, so
the ratio prices host-speed variance out of the comparison and what
remains is plan cost. A regression = normalized ratio > threshold AND
> 0.2s absolute (small entries jitter multiplicatively). Waived entries
are reported but do not fail the gate — the waiver list is the written
record the close ritual requires.

Exit 1 on any non-waived regression; the close ritual in NEXT.md runs
this against the previous round's driver BENCH file before commit.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # driver wrapper first ({"parsed": {...}}), else first JSON line
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if "parsed" in doc and isinstance(doc["parsed"], dict):
                return doc["parsed"]
            if "queries" in doc:
                return doc
    except ValueError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                doc = json.loads(line)
            except ValueError:
                continue
            if "queries" in doc:
                return doc
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> int:
    args = []
    threshold = 1.5
    waived: set[str] = set()
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a
                              else argv[i + 1])
            i += 1 if "=" in a else 2
            continue
        if a.startswith("--waive"):
            raw = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            waived |= {w.strip() for w in raw.split(",") if w.strip()}
            i += 1 if "=" in a else 2
            continue
        args.append(a)
        i += 1
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    # host-speed normalization: the calibration replay measures the
    # fixture-independent floor, so its ratio prices out host variance
    cal_ratio = 1.0
    if old.get("stream_calibration_sec") and new.get("stream_calibration_sec"):
        cal_ratio = (new["stream_calibration_sec"]
                     / old["stream_calibration_sec"])
    regressions, wins, waived_hits = [], [], []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name] * cal_ratio, nq[name]
        if b > a * threshold and b - a > 0.2:
            (waived_hits if name in waived else regressions).append(
                (name, a, b))
        elif a > b * threshold and a - b > 0.2:
            wins.append((name, a, b))
    report = {
        "old_total": old["value"], "new_total": new["value"],
        "calibration_ratio": round(cal_ratio, 3),
        "threshold": threshold,
        "regressions": [
            {"query": n, "old_normalized": round(a, 3), "new": b,
             "ratio": round(b / a, 2)}
            for n, a, b in regressions
        ],
        "waived_regressions": [
            {"query": n, "old_normalized": round(a, 3), "new": b,
             "ratio": round(b / a, 2)}
            for n, a, b in waived_hits
        ],
        "wins": [
            {"query": n, "old_normalized": round(a, 3), "new": b,
             "ratio": round(a / b, 2)}
            for n, a, b in wins
        ],
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
    }
    print(json.dumps(report, indent=2))
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
