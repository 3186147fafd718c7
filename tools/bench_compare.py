"""Compare two bench JSON outputs per query — the regression detector
for round-over-round work.

Usage: `python tools/bench_compare.py OLD.json NEW.json [--threshold 1.3]`

Prints queries slower than threshold× their old time (regressions),
faster than 1/threshold (wins), and entries added/removed. Exit code 1
if any regression exceeds the threshold AND 0.2s absolute (small
queries jitter multiplicatively; sub-0.2s deltas are noise at sf0.1).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.3
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    regressions, wins = [], []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if b > a * threshold and b - a > 0.2:
            regressions.append((name, a, b))
        elif a > b * threshold and a - b > 0.2:
            wins.append((name, a, b))
    report = {
        "old_total": old["value"], "new_total": new["value"],
        "regressions": [
            {"query": n, "old": a, "new": b, "ratio": round(b / a, 2)}
            for n, a, b in regressions
        ],
        "wins": [
            {"query": n, "old": a, "new": b, "ratio": round(a / b, 2)}
            for n, a, b in wins
        ],
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
    }
    print(json.dumps(report, indent=2))
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
