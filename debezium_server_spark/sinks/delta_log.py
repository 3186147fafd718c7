"""Minimal Delta Lake transaction-log table — the lake-format sink the
reference reaches through its Fluss/JDBC PK-table writers
(`FlussChangeConsumer.java:256-313` MERGE semantics), implemented
against the PUBLIC Delta protocol (delta-io PROTOCOL.md) without the
delta library (absent in this container; NEXT.md blocked-item #2).

What this gives over `VersionedParquetTable`: the table is readable by
ANY external Delta engine — data files are immutable parquet under the
table root in `__bucket=N/` partition dirs, and `_delta_log/
{version:020d}.json` holds newline-delimited action records:

  version 0:  commitInfo, protocol(minReader=1, minWriter=2),
              metaData(id, format, schemaString, partitionColumns), add*
  version N:  commitInfo, remove* (replaced files of touched buckets),
              add* (rewritten bucket files)

Scale contract (the same one the hard-link scheme had, now in Delta's
native vocabulary): a commit touching k of B buckets logs O(k) actions
— untouched buckets appear NOWHERE in the commit, their files simply
stay live. remove actions are logical tombstones (files stay on disk
for time travel until a VACUUM-style cleanup), which is exactly the
protocol's model. Log replay cost grows with commit count; real
deployments checkpoint the log every 10 commits — out of scope here
and documented, since the container has no reader to validate
checkpoint parquet against.

Same interface as `VersionedParquetTable` (read / commit / last_epoch /
current_version / bucket_expr), so `ParquetUpsertSink(table_format=
"delta")` swaps the storage layer and keeps the epoch-idempotent MERGE
contract and its tests.

Single-writer discipline: the log write is `open(path, "x")` —
put-if-absent, the protocol's optimistic-concurrency primitive; a
concurrent writer loses with FileExistsError instead of corrupting.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


class DeltaLogTable:
    """Hash-bucketed Delta table (see module docstring)."""

    def __init__(self, path: str, n_buckets: int = 16, retain: int = 2):
        self.path = path
        self.log_dir = os.path.join(path, "_delta_log")
        os.makedirs(self.log_dir, exist_ok=True)
        meta = self._replay_meta()
        self.n_buckets = meta.get("n_buckets", n_buckets)
        self.retain = retain  # interface parity; removes are logical
        #: snapshot version this transaction read (optimistic
        #: concurrency): commit() attempts snapshot+1 and FAILS on a
        #: conflicting writer instead of silently building on top of it
        self._snapshot_version: int | None = None

    # ------------------------------------------------------------ log

    def _log_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def _versions(self) -> list[int]:
        return sorted(
            int(f[:-5]) for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:-5].isdigit())

    def _read_commit(self, version: int) -> list[dict]:
        with open(self._log_path(version)) as f:
            return [json.loads(line) for line in f if line.strip()]

    def _replay_meta(self) -> dict:
        for v in self._versions():
            for action in self._read_commit(v):
                if "metaData" in action:
                    cfg = action["metaData"].get("configuration", {})
                    return {"n_buckets": int(cfg.get("bucketing.count", 16))}
        return {}

    def _live_files(self, upto: int | None = None) -> dict[str, dict]:
        """Replay add/remove actions → {relative path: add action}."""
        live: dict[str, dict] = {}
        for v in self._versions():
            if upto is not None and v > upto:
                break
            for action in self._read_commit(v):
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
        return live

    # ------------------------------------------ VersionedParquetTable API

    def current_version(self) -> int:
        """Commit count (0 = empty) — interface-compatible with
        VersionedParquetTable; the Delta version on disk is count-1."""
        vs = self._versions()
        return (vs[-1] + 1) if vs else 0

    def last_epoch(self) -> int | None:
        vs = self._versions()
        if not vs:
            return None
        for action in self._read_commit(vs[-1]):
            if "commitInfo" in action:
                return action["commitInfo"]["operationParameters"].get("epoch")
        return None

    def bucket_expr(self, key_cols: tuple[str, ...]):
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(self.n_buckets)
        ).cast("int")

    def data_path(self, version: int | None = None) -> str | None:
        return self.path if self.current_version() > 0 else None

    def read(self, spark: SparkSession,
             version: int | None = None) -> DataFrame | None:
        """Current state, or time-travel to after the `version`-th
        commit (1-based, like VersionedParquetTable) by replaying the
        log prefix — the protocol's VERSION AS OF semantics."""
        current = self.current_version()
        if version is None:
            self._snapshot_version = current  # transaction snapshot
        elif version > current:
            raise ValueError(
                f"version {version} not committed for {self.path} "
                f"(current {current})")
        upto = None if version is None else version - 1
        if version == 0 or current == 0:
            return None
        files = [os.path.join(self.path, p)
                 for p in self._live_files(upto=upto)]
        if not files:
            return None
        return spark.read.option("basePath", self.path).parquet(*files)

    def commit(self, df: DataFrame, epoch_id: int,
               touched_buckets: list[int] | None = None) -> int:
        """Stage `df`'s parquet, move files under `__bucket=N/`, append
        one log version: removes for the replaced files of touched
        buckets (every live file when `touched_buckets is None` — full
        rewrite), adds for the new ones. O(touched) actions."""
        # next version = the snapshot this transaction READ + 1; a
        # writer that committed in between owns that file and we lose
        # with FileExistsError below (the protocol's conflict signal)
        delta_version = (self._snapshot_version
                         if self._snapshot_version is not None
                         else self.current_version())
        # staging dir AND data-file names carry a per-attempt unique
        # token (the protocol's UUID part-name convention): a LOSING
        # concurrent writer can never clobber the winner's committed
        # parquet — its moved files become unreferenced orphans that
        # vacuum() collects, and the loser still fails put-if-absent
        import tempfile as _tempfile

        staging = _tempfile.mkdtemp(dir=self.path, prefix="_staging_")
        token = os.path.basename(staging).removeprefix("_staging_")
        if BUCKET_COL in df.columns:
            df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
        else:
            df.write.mode("overwrite").parquet(staging)
            touched_buckets = None

        # collect staged parquet from bucket dirs AND flat layout (an
        # unbucketed df stages files at the staging ROOT — they must
        # become adds too, not silently vanish)
        staged: list[tuple[str, str, dict]] = []  # (src, rel_dir, pv)
        for entry in sorted(os.listdir(staging)):
            full = os.path.join(staging, entry)
            if os.path.isdir(full) and entry.startswith(f"{BUCKET_COL}="):
                pv = {BUCKET_COL: entry.split("=", 1)[1]}
                for fname in sorted(os.listdir(full)):
                    if fname.endswith(".parquet") and not fname.startswith("."):
                        staged.append((os.path.join(full, fname), entry, pv))
            elif (os.path.isfile(full) and entry.endswith(".parquet")
                  and not entry.startswith(".")):
                staged.append((full, "__unpartitioned", {}))

        adds: list[dict] = []
        for seq, (src, rel_dir, pv) in enumerate(staged):
            os.makedirs(os.path.join(self.path, rel_dir), exist_ok=True)
            rel = (f"{rel_dir}/part-{delta_version:010d}-{seq:05d}-"
                   f"{token}.snappy.parquet")
            dst = os.path.join(self.path, rel)
            os.replace(src, dst)
            st = os.stat(dst)
            adds.append({"add": {
                "path": rel,
                "partitionValues": pv,
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
            }})
        shutil.rmtree(staging, ignore_errors=True)

        removes: list[dict] = []
        if delta_version > 0:
            live = self._live_files(upto=delta_version - 1)
            if touched_buckets is None:
                doomed = list(live)
            else:
                dirs = {f"{BUCKET_COL}={b}" for b in touched_buckets}
                doomed = [p for p in live if p.split("/", 1)[0] in dirs]
            removes = [{"remove": {"path": p, "dataChange": True,
                                   "deletionTimestamp": adds[0]["add"]
                                   ["modificationTime"] if adds else 0}}
                       for p in sorted(doomed)]

        actions: list[dict] = [{"commitInfo": {
            "operation": "MERGE" if delta_version > 0 else "WRITE",
            "operationParameters": {"epoch": epoch_id},
            "engineInfo": "debezium-server-spark/minimal-delta-writer",
        }}]
        if delta_version == 0:
            schema = df.schema
            actions.append({"protocol": {"minReaderVersion": 1,
                                         "minWriterVersion": 2}})
            actions.append({"metaData": {
                "id": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     "dss-delta:" + self.path)),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema.json(),
                "partitionColumns": ([BUCKET_COL] if BUCKET_COL
                                     in df.columns else []),
                "configuration": {"bucketing.count": str(self.n_buckets)},
            }})
        actions += removes + adds

        tmp = self._log_path(delta_version) + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(json.dumps(a, separators=(",", ":"))
                              for a in actions) + "\n")
        # put-if-absent: the protocol's optimistic-concurrency primitive
        with open(self._log_path(delta_version), "x") as dst_f, \
                open(tmp) as src_f:
            dst_f.write(src_f.read())
        os.remove(tmp)
        self._snapshot_version = delta_version + 1
        return delta_version + 1

    # ------------------------------------------------------ maintenance

    def vacuum(self) -> list[str]:
        """Physically delete files removed from the log (no retention
        window here — the caller owns the time-travel trade-off; real
        Delta defaults to 7 days). Returns deleted relative paths."""
        live = set(self._live_files())
        deleted = []
        for dirname in os.listdir(self.path):
            d = os.path.join(self.path, dirname)
            if dirname == "_delta_log" or not os.path.isdir(d):
                continue
            for fname in os.listdir(d):
                rel = f"{dirname}/{fname}"
                if rel not in live and fname.endswith(".parquet"):
                    os.remove(os.path.join(d, fname))
                    deleted.append(rel)
        return deleted
