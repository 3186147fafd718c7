"""Deterministic driver-observation-window rotation (round-3 verdict #1).

The driver's correctness gate checks the FIRST 50 entries of
`__spark_entry__.queries()`. A static curated window means the other
~190 catalog entries never earn a green `CORRECTNESS_r*.json` row, no
matter how many rounds run. This tool computes the next round's window
deterministically and writes it to `DRIVER_WINDOW.json` (committed;
read by `__spark_entry__.py` at import):

- **Canaries** (fixed ~10): one long-green entry per shared
  infrastructure path (table load/compare, streaming replay harness,
  CEP automaton, the applyInPandas escape hatch, minhash macro family,
  PQ/ANN eval, iterative graph, TPC-H join shapes) — so a regression in
  a shared path is caught even in rounds where no entry of that family
  rotates in.
- **Debutantes**: entries never seen in any committed
  `CORRECTNESS_r*.json` (the driver's actual observation record — no
  second bookkeeping that could drift), in catalog order.
- **Refresh**: remaining slots filled with the least-recently-observed
  entries (oldest last-green round first, catalog order tiebreak).

History is derived from the committed CORRECTNESS files themselves, so
re-running the tool is idempotent per round and the schedule is fully
reproducible from the repo. With 50 slots, ~10 canaries and ~190
unseen entries, every catalog entry earns its first driver row within
ceil(190/40) = 5 rounds (the 50/round driver budget makes 4 rounds
arithmetically impossible for 241 entries; the verdict's ">=30 never-
checked entries per round" pace is exceeded at 40).

Run: `python tools/rotate_driver_window.py [round_no]` from the repo
root after the catalog for the round is final; commit the JSON.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50

#: One long-green canary per shared execution path. Kept in the window
#: EVERY round: these are regression tripwires for the infrastructure
#: all other entries share, not coverage.
CANARIES = (
    "cdc_latest_state",        # load/compare path + envelope latest-wins
    "route_rename",            # SMT/routing surface
    "predicate_filter_json",   # predicate transforms + JSON functions
    "stream_hourly_counts",    # streaming replay harness + watermarks
    "stream_cep_matches",      # CEP automaton state machine
    "clamped_running_balance", # the applyInPandas escape hatch
    "dedup_minhash_apply",     # minhash/banding macro family + true CC
    "embedding_pq_recall_eval",# PQ encode/ADC + recall-eval harness
    "graph_pagerank",          # unrolled iterative convention
    "q1_pricing_summary",      # TPC-H agg/decimal discipline
)

#: Entries ADDED in the current round — scheduled into the window ahead
#: of the older never-observed backlog (newest code = least soak time,
#: the round-2/3 window-curation principle). Update per round.
NEW_THIS_ROUND = (
    # round 7: TWO new entries (under the ≤5 cap — round-6 verdict #1
    # prioritizes backlog drain)
    "logminer_cdc_changes",
    "delta_upsert_roundtrip",
    # PINNED: sqlserver_cdc_changes changed OUTPUT SCHEMA this round
    # (the unpaired-op-3 fix added an `error` column) — its r06 green
    # row predates the change, so force a fresh driver observation
    "sqlserver_cdc_changes",
)


def observed_rounds() -> dict[str, int]:
    """name -> latest round with a green driver row (from committed
    CORRECTNESS_r*.json files)."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name in data:
            seen[name] = max(seen.get(name, 0), rnd)
    return seen


def compute_window(round_no: int) -> dict:
    from debezium_server_spark.plans.catalog import CATALOG

    order = {name: i for i, name in enumerate(CATALOG)}
    seen = observed_rounds()
    missing = [c for c in CANARIES if c not in CATALOG]
    if missing:
        raise SystemExit(f"canaries not in catalog: {missing}")

    window: list[str] = list(CANARIES)
    window += [n for n in NEW_THIS_ROUND
               if n in CATALOG and n not in set(window)]
    # HARD 50-slot contract: if canaries + NEW_THIS_ROUND ever exceed
    # WINDOW_SIZE, a negative slice below would silently append the
    # whole pool and balloon the manifest past the driver's gate
    # (round-4 review finding). Truncate NEW overflow explicitly
    # (newest-listed entries are at the tail and survive next round's
    # never-observed fill) and assert the invariant at the end.
    if len(window) > WINDOW_SIZE:
        print(f"WARNING: canaries+new = {len(window)} > {WINDOW_SIZE}; "
              f"truncating NEW_THIS_ROUND overflow")
        window = window[:WINDOW_SIZE]
    pool = [n for n in CATALOG if n not in set(window)]
    # debutantes first (never observed), then least-recently-observed;
    # catalog order inside each class keeps the schedule deterministic
    pool.sort(key=lambda n: (seen.get(n, 0), order[n]))
    window.extend(pool[: max(0, WINDOW_SIZE - len(window))])
    assert len(window) == min(WINDOW_SIZE, len(CATALOG)), len(window)

    never_before = [n for n in window if n not in seen]
    # projected first-observation round for every never-observed entry
    # OUTSIDE this round's window (the previous pool-slice form silently
    # dropped the entries displaced by NEW_THIS_ROUND — round-4 review
    # finding). Throughput estimate per future round: canaries are
    # fixed and future rounds will prioritize their own new entries —
    # use this round's NEW count as the estimate of that drain, so the
    # projection errs late rather than early.
    in_window = set(window)
    remaining = [n for n in CATALOG
                 if n not in in_window and n not in seen]
    remaining.sort(key=lambda n: order[n])
    per_round = max(WINDOW_SIZE - len(CANARIES) - len(NEW_THIS_ROUND), 1)
    schedule = {
        n: round_no + 1 + (i // per_round) for i, n in enumerate(remaining)
    }
    return {
        "round": round_no,
        "policy": "canaries + never-driver-observed (catalog order) + "
                  "least-recently-observed fill; history derived from "
                  "committed CORRECTNESS_r*.json",
        "window_size": WINDOW_SIZE,
        "canaries": list(CANARIES),
        "window": window,
        "first_time_in_window": never_before,
        "n_first_time": len(never_before),
        "observed_last_round": {n: seen.get(n, 0) for n in CATALOG},
        "projected_first_observation": schedule,
        "full_coverage_by_round": (max(schedule.values())
                                   if schedule else round_no),
    }


def main() -> None:
    round_no = int(sys.argv[1]) if len(sys.argv) > 1 else None
    if round_no is None:
        rounds = [int(re.search(r"r(\d+)", p).group(1))
                  for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))]
        round_no = (max(rounds) if rounds else 0) + 1
    manifest = compute_window(round_no)
    out = os.path.join(REPO, "DRIVER_WINDOW.json")
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"round {round_no}: window={len(manifest['window'])} "
          f"first_time={manifest['n_first_time']} "
          f"full_coverage_by_round={manifest['full_coverage_by_round']}")


if __name__ == "__main__":
    main()
