"""Per-entry bench regression GATE (round-5 verdict #5; normalization
per round-6 verdict #2) — compares two bench outputs and fails the
close ritual when an entry got structurally slower round-over-round.

Usage:
    python tools/bench_compare.py OLD.json NEW.json \
        [--threshold 1.5] [--waive name1,name2]

Accepts the raw one-line bench.py output, the driver's wrapped
`BENCH_r{N}.json` ({"parsed": {...}}), and `BENCH_DETAIL.json`.

Comparison modes, per entry:

- **normalized** (preferred): both sides carry a calibration anchor for
  the entry's kind — `batch_calibration_sec` for batch entries,
  `stream_calibration_sec` for stream entries (or an explicit
  `normalized` map, as BENCH_DETAIL.json has). The gate compares
  seconds ÷ probe-seconds: unitless multiples of fixed host work, so
  uniform host drift cancels EXACTLY and no hand-argued waivers are
  needed. The absolute guard converts back to seconds at the new
  host's speed.
- **stream_net** (round-7 verdict #4, preferred for stream entries):
  both sides support the floor-subtracted value (explicit
  `normalized_net` map, or derived as normalized - 1) — the ~3s/entry
  replay harness measured by the stream probe is subtracted so the
  ratio compares OPERATOR work, restoring resolution on entries whose
  wall is mostly fixed cost.
- **legacy** fallback: the old file predates the batch probe — batch
  entries are compared raw with the stream-calibration ratio applied
  to the old time (the round-5 behavior), which under-corrects when
  batch and stream drift differ.

A regression = ratio > threshold AND > 0.2s absolute (small entries
jitter multiplicatively). Waived entries are reported but do not fail
the gate — the waiver list is the written record the close ritual
requires. Exit 1 on any non-waived regression; the close ritual in
NEXT.md runs this against the previous round's driver BENCH file
before commit.
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


def _cal_for(doc: dict, name: str) -> float | None:
    key = ("stream_calibration_sec" if name.startswith("stream_")
           else "batch_calibration_sec")
    return doc.get(key) or None


def norm_of(doc: dict, name: str) -> float | None:
    """Entry's host-normalized value (seconds ÷ matching probe), from
    the explicit `normalized` map or computed from the calibrations;
    None when the file predates the matching probe."""
    if name in doc.get("normalized", {}):
        return doc["normalized"][name]
    cal = _cal_for(doc, name)
    if cal:
        return doc["queries"][name] / cal
    return None


def net_of(doc: dict, name: str) -> float | None:
    """Stream entry's FLOOR-SUBTRACTED normalized value — operator
    work in probe units, (sec - calibration)/calibration floored at
    0.05 (round-7 verdict #4: ~3s/entry of replay harness otherwise
    compresses every stream ratio toward 1). From the explicit
    `normalized_net` map when present, else derived as normalized - 1
    — so any file with a stream calibration supports net mode."""
    if not name.startswith("stream_"):
        return None
    if name in doc.get("normalized_net", {}):
        return doc["normalized_net"][name]
    gross = norm_of(doc, name)
    if gross is None:
        return None
    return max(gross - 1.0, 0.05)


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
    # legacy fallback ratio (stream probe only — the round-5 behavior)
    cal_ratio = 1.0
    if old.get("stream_calibration_sec") and new.get("stream_calibration_sec"):
        cal_ratio = (new["stream_calibration_sec"]
                     / old["stream_calibration_sec"])
    regressions, wins, waived_hits = [], [], []
    n_normalized = n_legacy = 0
    for name in sorted(set(oq) & set(nq)):
        o_net, n_net = net_of(old, name), net_of(new, name)
        o_norm, n_norm = norm_of(old, name), norm_of(new, name)
        if o_net is not None and n_net is not None:
            # stream entries gate on the floor-subtracted value: the
            # ~3s replay harness is measured by the probe, not the
            # operator — subtracting it restores the gate's resolution
            n_normalized += 1
            mode = "stream_net"
            a, b = o_net, n_net
            abs_delta = (b - a) * (_cal_for(new, name) or 1.0)
        elif o_norm is not None and n_norm is not None:
            n_normalized += 1
            mode = "normalized"
            a, b = o_norm, n_norm
            # absolute guard in seconds at the NEW host's speed
            abs_delta = (b - a) * (_cal_for(new, name) or 1.0)
        else:
            n_legacy += 1
            mode = "legacy"
            a, b = oq[name] * cal_ratio, nq[name]
            abs_delta = b - a
        if b > a * threshold and abs_delta > 0.2:
            (waived_hits if name in waived else regressions).append(
                (name, a, b, mode))
        elif a > b * threshold and -abs_delta > 0.2:
            wins.append((name, a, b, mode))

    def rows(items, invert=False):
        return [
            {"query": n, "old": round(a, 3), "new": round(b, 3),
             "ratio": round((a / b) if invert else (b / a), 2),
             "mode": m}
            for n, a, b, m in items
        ]

    report = {
        "old_total": old["value"], "new_total": new["value"],
        "calibration_ratio_legacy": round(cal_ratio, 3),
        "batch_calibration": [old.get("batch_calibration_sec"),
                              new.get("batch_calibration_sec")],
        "stream_calibration": [old.get("stream_calibration_sec"),
                               new.get("stream_calibration_sec")],
        "entries_normalized": n_normalized,
        "entries_legacy": n_legacy,
        "threshold": threshold,
        "regressions": rows(regressions),
        "waived_regressions": rows(waived_hits),
        "wins": rows(wins, invert=True),
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
    }
    print(json.dumps(report, indent=2))
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
