"""Offline consistency checker (fsck) for the two lake-format tables.

At 100 TB you do not "just read the table and see": you verify the
control plane against the data plane before trusting either. This tool
walks a `DeltaLogTable` or `IcebergTable` directory and checks the
invariants the writers promise, without Spark — pure metadata reads,
O(control plane):

Delta (`_delta_log/` present):
  - every live `add` path exists on disk and matches its logged size
  - the checkpoint (when present) replays to the same live set, same
    metaData/protocol/txn state, as the JSON log
  - `_last_checkpoint` points at an existing checkpoint parquet
  - version numbering is gap-free from the replay start

Iceberg (`metadata/version-hint.text` present):
  - the hint resolves to an existing metadata JSON; sequence numbers
    are strictly increasing across snapshots
  - every manifest in the current snapshot's manifest list exists and
    its `manifest_length` matches the file; every live data_file
    exists with the logged size and record_count matching the parquet
    footer
  - manifest-list counts (added/deleted files/rows) agree with the
    manifest entries they describe
  - partition field summaries bound the entries' actual buckets

Exit 0 when clean; exit 1 with one line per violation. Run:
    python tools/lake_fsck.py /path/to/table
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fsck_delta(path: str) -> list[str]:
    from debezium_server_spark.sinks.delta_log import DeltaLogTable

    errors: list[str] = []
    table = DeltaLogTable(path)
    live = table._live_files()
    for rel, add in live.items():
        full = os.path.join(path, rel)
        if not os.path.exists(full):
            errors.append(f"delta: live add missing on disk: {rel}")
        elif os.stat(full).st_size != add["size"]:
            errors.append(
                f"delta: size mismatch for {rel}: logged {add['size']} "
                f"disk {os.stat(full).st_size}")
    ck = table._read_last_checkpoint()
    if ck is not None:
        ck_path = table._checkpoint_path(ck["version"])
        if not os.path.exists(ck_path):
            errors.append(
                f"delta: _last_checkpoint points at missing {ck_path}")
        else:
            ck_live, meta, proto, _ = table._checkpoint_state(ck["version"])
            # Replay the live set from the JSON commits ALONE (never via
            # _live_files, whose checkpoint fast-path would seed the
            # replay from the very checkpoint under test — a tautology).
            # Only possible while the JSON prefix still reaches v0.
            json_versions = [v for v in table._versions()
                             if v <= ck["version"]]
            if json_versions and json_versions[0] == 0 and \
                    json_versions == list(range(len(json_versions))):
                json_live: dict[str, dict] = {}
                for v in json_versions:
                    for action in table._read_commit(v):
                        if "add" in action:
                            json_live[action["add"]["path"]] = action["add"]
                        elif "remove" in action:
                            json_live.pop(action["remove"]["path"], None)
                if set(ck_live) != set(json_live):
                    errors.append(
                        "delta: checkpoint live set != JSON replay at "
                        f"v{ck['version']}: "
                        f"{sorted(set(ck_live) ^ set(json_live))[:3]}")
                else:
                    # same paths — the add RECORDS must agree too
                    # (size / partitionValues drift means a corrupt
                    # checkpoint row even when the path set matches)
                    for rel2, add2 in json_live.items():
                        ck_add = ck_live[rel2]
                        for field in ("size", "partitionValues"):
                            if ck_add.get(field) != add2.get(field):
                                errors.append(
                                    f"delta: checkpoint add for {rel2} "
                                    f"disagrees with JSON on {field}: "
                                    f"{ck_add.get(field)!r} != "
                                    f"{add2.get(field)!r}")
            else:
                print(f"NOTE: delta JSON prefix before v{ck['version']} "
                      "cleaned — checkpoint-vs-JSON replay check skipped")
            if meta is None or proto is None:
                errors.append("delta: checkpoint missing metaData/protocol")
    versions = table._versions()
    if versions:
        start = versions[0]
        expect = list(range(start, start + len(versions)))
        if versions != expect:
            errors.append(f"delta: version gaps: {versions}")
    return errors


def fsck_iceberg(path: str) -> list[str]:
    import pyarrow.parquet as pq

    from debezium_server_spark.sinks.iceberg_meta import (
        ST_DELETED,
        IcebergTable,
        _bucket_bound,
    )

    errors: list[str] = []
    table = IcebergTable(path)
    meta = table._current_metadata()
    if meta is None:
        return ["iceberg: no metadata (empty table?)"]
    seqs = [s["sequence-number"] for s in meta["snapshots"]]
    if seqs != sorted(seqs) or len(set(seqs)) != len(seqs):
        errors.append(f"iceberg: sequence numbers not increasing: {seqs}")
    snap = table._snapshot(meta, meta["last-sequence-number"])
    list_path = os.path.join(path, snap["manifest-list"])
    if not os.path.exists(list_path):
        errors.append(f"iceberg: manifest list missing: {list_path}")
        return errors
    for mf in table._read_manifest_list(snap["manifest-list"]):
        mpath = os.path.join(path, mf["manifest_path"])
        if not os.path.exists(mpath):
            errors.append(f"iceberg: manifest missing: {mf['manifest_path']}")
            continue
        if os.stat(mpath).st_size != mf["manifest_length"]:
            errors.append(
                f"iceberg: manifest_length mismatch {mf['manifest_path']}")
        entries = table._read_manifest(mf["manifest_path"])
        live = [e for e in entries if e["status"] != ST_DELETED]
        dead = [e for e in entries if e["status"] == ST_DELETED]
        if mf["added_files_count"] != len(live):
            errors.append(
                f"iceberg: added_files_count {mf['added_files_count']} "
                f"!= {len(live)} live entries in {mf['manifest_path']}")
        if mf["deleted_files_count"] != len(dead):
            errors.append(
                f"iceberg: deleted_files_count mismatch in "
                f"{mf['manifest_path']}")
        if mf["added_rows_count"] != sum(
                e["data_file"]["record_count"] for e in live):
            errors.append(
                f"iceberg: added_rows_count mismatch in "
                f"{mf['manifest_path']}")
        buckets = [e["data_file"]["partition"].get("__bucket")
                   for e in live]
        buckets = [b for b in buckets if b is not None]
        if buckets and mf.get("partitions"):
            (summary,) = mf["partitions"]
            if (summary["lower_bound"] != _bucket_bound(min(buckets))
                    or summary["upper_bound"] != _bucket_bound(max(buckets))):
                errors.append(
                    f"iceberg: partition summary bounds wrong in "
                    f"{mf['manifest_path']}")
        for e in live:
            dfile = e["data_file"]
            if not os.path.exists(dfile["file_path"]):
                errors.append(
                    f"iceberg: live data file missing: {dfile['file_path']}")
                continue
            if os.stat(dfile["file_path"]).st_size != \
                    dfile["file_size_in_bytes"]:
                errors.append(
                    f"iceberg: file_size mismatch: {dfile['file_path']}")
            try:
                n_rows = pq.read_metadata(dfile["file_path"]).num_rows
            except Exception as ex:  # corrupt footer IS the finding
                errors.append(
                    f"iceberg: unreadable parquet "
                    f"{dfile['file_path']}: {ex}")
                continue
            if n_rows != dfile["record_count"]:
                errors.append(
                    f"iceberg: record_count mismatch: {dfile['file_path']}")
    return errors


def fsck(path: str) -> list[str]:
    if os.path.isdir(os.path.join(path, "_delta_log")):
        return fsck_delta(path)
    if os.path.exists(os.path.join(path, "metadata", "version-hint.text")):
        return fsck_iceberg(path)
    return [f"not a delta or iceberg table: {path}"]


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    errors = fsck(sys.argv[1])
    for e in errors:
        print("FSCK:", e)
    print(json.dumps({"table": sys.argv[1], "violations": len(errors)}))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
