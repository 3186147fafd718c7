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
protocol's model. Log replay cost is bounded by the CHECKPOINT
mechanism (PROTOCOL.md "Checkpoints"): every `checkpoint_interval`
(10, the protocol's default cadence) commits, the full replay state —
one parquet row per live `add` plus the `metaData` and `protocol`
rows — lands in `_delta_log/{version:020d}.checkpoint.parquet` and
`_last_checkpoint` points at it, so a reader replays O(interval) JSON
commits after one parquet read instead of the whole history, and JSON
commits at or before the checkpoint version become deletable. The
checkpoint is written driver-side with pyarrow: its row count is
O(live files) = O(n_buckets) here (each commit REPLACES bucket files),
a bounded control frame, not a data-plane write. Validation is
protocol-level assertion (no external Delta reader exists in this
container — still a watch item).

Same interface as `VersionedParquetTable` (read / commit / last_epoch /
current_version / bucket_expr), so `ParquetUpsertSink(table_format=
"delta")` swaps the storage layer and keeps the epoch-idempotent MERGE
contract and its tests.

Single-writer discipline: the log write is `open(path, "x")` —
put-if-absent, the protocol's optimistic-concurrency primitive; a
concurrent writer loses with FileExistsError instead of corrupting.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def _schema_fingerprint(schema_json: str) -> str:
    """Canonical form of a Spark schema JSON for drift detection:
    struct fields sorted by name, nullability flags (`nullable`,
    `containsNull`, `valueContainsNull`) and `metadata` stripped at
    every nesting level. Spark introduces benign jitter in exactly
    those dimensions between micro-batches (filters/joins flip
    nullability, select order permutes fields); only a change that
    survives this normalization is real evolution — parquet column
    resolution is by name, so same-fingerprint files are mutually
    readable without footer merging."""

    def norm(node):
        if isinstance(node, dict):
            out = {k: norm(v) for k, v in node.items()
                   if k not in ("nullable", "containsNull",
                                "valueContainsNull", "metadata")}
            if out.get("type") == "struct" and isinstance(
                    out.get("fields"), list):
                out["fields"] = sorted(
                    out["fields"], key=lambda f: f.get("name", ""))
            return out
        if isinstance(node, list):
            return [norm(x) for x in node]
        return node

    try:
        parsed = json.loads(schema_json)
    except ValueError:  # foreign/absent schemaString: never matches
        return schema_json
    return json.dumps(norm(parsed), sort_keys=True,
                      separators=(",", ":"))


def _fingerprint_tag(schema_json: str) -> str:
    """Short digest of the NORMALIZED schema fingerprint, recorded on
    every `add` action's `tags` (the protocol's free-form file
    metadata map). Lets a later PARTIAL compaction prove, from the
    control plane alone, that the untouched live files already carry
    the current schema — the precondition for dropping the sticky
    `schema.evolved` flag without a full rewrite."""
    return hashlib.sha256(
        _schema_fingerprint(schema_json).encode()).hexdigest()[:16]


class DeltaLogTable:
    """Hash-bucketed Delta table (see module docstring)."""

    def __init__(self, path: str, n_buckets: int = 16, retain: int = 2,
                 checkpoint_interval: int = 10):
        self.path = path
        self.log_dir = os.path.join(path, "_delta_log")
        os.makedirs(self.log_dir, exist_ok=True)
        self.checkpoint_interval = checkpoint_interval
        meta = self._replay_meta()
        self.n_buckets = meta.get("n_buckets", n_buckets)
        self.retain = retain  # interface parity; removes are logical
        #: the protocol's idempotent-writer identity (`txn` actions:
        #: appId + version): stable per table path so a restarted
        #: pipeline writing the same table resumes the same stream
        self.app_id = str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     "dss-delta-txn:" + path))
        #: snapshot version this transaction read (optimistic
        #: concurrency): commit() attempts snapshot+1 and FAILS on a
        #: conflicting writer instead of silently building on top of it
        self._snapshot_version: int | None = None
        #: set by compact() for a FULL rewrite: this commit may drop
        #: the sticky `schema.evolved` flag (all live files now share
        #: one schema, so reads no longer need mergeSchema)
        self._clear_evolved_on_commit = False

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

    # ------------------------------------------------------ checkpoints

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.log_dir,
                            f"{version:020d}.checkpoint.parquet")

    def _read_last_checkpoint(self) -> dict | None:
        """The `_last_checkpoint` pointer file ({"version": V,
        "size": N} per PROTOCOL.md), or None."""
        try:
            with open(os.path.join(self.log_dir, "_last_checkpoint")) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _usable_checkpoint(self, upto: int | None) -> int | None:
        """Version of the last checkpoint iff it exists and covers a
        prefix of the requested replay range."""
        ck = self._read_last_checkpoint()
        if (ck is not None
                and (upto is None or upto >= ck["version"])
                and os.path.exists(self._checkpoint_path(ck["version"]))):
            return int(ck["version"])
        return None

    def _checkpoint_state(self, version: int):
        """Checkpoint parquet → ({path: add}, metaData, protocol,
        {appId: txn version}). pyarrow map columns come back as (k, v)
        tuple lists — normalized to dicts so checkpoint state is
        interchangeable with JSON-replayed state."""
        import pyarrow.parquet as pq

        def demap(v):
            if isinstance(v, list) and all(
                    isinstance(x, tuple) and len(x) == 2 for x in v):
                return dict(v)
            return v

        live: dict[str, dict] = {}
        txns: dict[str, int] = {}
        meta = proto = None
        for row in pq.read_table(self._checkpoint_path(version)).to_pylist():
            if row.get("add") is not None:
                add = {k: demap(v) for k, v in row["add"].items()}
                live[add["path"]] = add
            elif row.get("metaData") is not None:
                meta = {k: demap(v) for k, v in row["metaData"].items()}
            elif row.get("protocol") is not None:
                proto = dict(row["protocol"])
            elif row.get("txn") is not None:
                txns[row["txn"]["appId"]] = row["txn"]["version"]
        return live, meta, proto, txns

    def write_checkpoint(self, version: int | None = None) -> str:
        """Write the classic checkpoint for `version` (default: the
        last committed one): one parquet row per action of the full
        replay state — every live `add`, plus `metaData` and
        `protocol` — and repoint `_last_checkpoint`. Row count is
        O(live files) = O(n_buckets) for this bucketed table (a
        bounded control frame; a huge unbucketed table would write it
        with Spark instead). JSON commits ≤ `version` become
        deletable afterwards: a reader needs only checkpoint +
        later JSON."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if version is None:
            version = self.current_version() - 1
        if version < 0:
            raise ValueError("nothing committed — no checkpoint to write")
        live = self._live_files(upto=version)
        # metaData/protocol/txn state: seed from the previous
        # checkpoint (the JSON prefix that DECLARED them may already be
        # cleaned), then apply later JSON declarations
        meta = proto = None
        txns: dict[str, int] = {}
        prev_ck = self._usable_checkpoint(upto=version)
        if prev_ck is not None and prev_ck < version:
            _, meta, proto, txns = self._checkpoint_state(prev_ck)
        for v in self._versions():  # latest declaration ≤ version wins
            if v > version:
                break
            for action in self._read_commit(v):
                if "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    proto = action["protocol"]
                elif "txn" in action:
                    txns[action["txn"]["appId"]] = action["txn"]["version"]
        if meta is None or proto is None:
            # a checkpoint without metaData+protocol is corrupt per
            # PROTOCOL.md — refuse rather than strand readers
            raise ValueError(
                f"cannot reconstruct metaData/protocol for checkpoint "
                f"{version} of {self.path} (cleaned prefix, no prior "
                f"checkpoint)")

        smap = pa.map_(pa.string(), pa.string())
        add_t = pa.struct([
            ("path", pa.string()), ("partitionValues", smap),
            ("size", pa.int64()), ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()), ("tags", smap)])
        meta_t = pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()),
                                  ("options", smap)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", smap)])
        proto_t = pa.struct([("minReaderVersion", pa.int32()),
                             ("minWriterVersion", pa.int32())])
        txn_t = pa.struct([("appId", pa.string()),
                           ("version", pa.int64())])
        none_row = {"protocol": None, "metaData": None, "add": None,
                    "txn": None}
        rows = [{**none_row, "protocol": proto},
                {**none_row, "metaData": meta}]
        # txn state is PART of the checkpoint per PROTOCOL.md — epoch
        # idempotence must survive JSON-prefix cleanup
        rows += [{**none_row, "txn": {"appId": app, "version": ver}}
                 for app, ver in sorted(txns.items())]
        rows += [{**none_row, "add": a} for _, a in sorted(live.items())]
        table = pa.Table.from_pylist(rows, schema=pa.schema(
            [("protocol", proto_t), ("metaData", meta_t), ("add", add_t),
             ("txn", txn_t)]))
        path = self._checkpoint_path(version)
        pq.write_table(table, path + ".tmp")
        os.replace(path + ".tmp", path)
        pointer = os.path.join(self.log_dir, "_last_checkpoint")
        with open(pointer + ".tmp", "w") as f:
            json.dump({"version": version, "size": len(rows)}, f)
        os.replace(pointer + ".tmp", pointer)
        return path

    # ------------------------------------------------------- log replay

    def _replay_meta(self) -> dict:
        for v in self._versions():
            for action in self._read_commit(v):
                if "metaData" in action:
                    cfg = action["metaData"].get("configuration", {})
                    return {"n_buckets": int(cfg.get("bucketing.count", 16))}
        ck = self._usable_checkpoint(upto=None)
        if ck is not None:  # JSON prefix cleaned: metaData lives in
            _, meta, _, _ = self._checkpoint_state(ck)  # the checkpoint
            if meta is not None:
                cfg = meta.get("configuration", {})
                return {"n_buckets": int(cfg.get("bucketing.count", 16))}
        return {}

    def _current_metadata_action(self) -> dict | None:
        """Latest `metaData` action (checkpoint seed + later JSON) —
        O(checkpoint interval) JSON reads, a bounded control read."""
        meta = None
        start = 0
        ck = self._usable_checkpoint(upto=None)
        if ck is not None:
            _, meta, _, _ = self._checkpoint_state(ck)
            start = ck + 1
        for v in self._versions():
            if v < start:
                continue
            for action in self._read_commit(v):
                if "metaData" in action:
                    meta = action["metaData"]
        return meta

    def _live_files(self, upto: int | None = None) -> dict[str, dict]:
        """Replay → {relative path: add action}: start from the last
        checkpoint when it covers a prefix of the range, then apply
        the JSON commits after it."""
        live: dict[str, dict] = {}
        start = 0
        ck = self._usable_checkpoint(upto)
        if ck is not None:
            live, _, _, _ = self._checkpoint_state(ck)
            start = ck + 1
        versions = self._versions()
        if start == 0 and (
                (versions and versions[0] != 0)
                or (not versions and self._read_last_checkpoint())):
            # JSON history does not reach version 0 and the checkpoint
            # does not cover the requested range (time travel below
            # it, or a missing checkpoint file): replaying would be
            # silently partial
            raise ValueError(
                f"delta log for {self.path} has no full history for "
                f"this range (cleaned prefix, no usable checkpoint)")
        for v in versions:
            if v < start:
                continue
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
        VersionedParquetTable; the Delta version on disk is count-1.
        The checkpoint pointer counts too: after log cleanup the
        newest state may be checkpoint-only."""
        vs = self._versions()
        ck = self._read_last_checkpoint()
        last = max(vs[-1] if vs else -1,
                   ck["version"] if ck else -1)
        return last + 1

    def last_epoch(self) -> int | None:
        vs = self._versions()
        if vs:
            for action in self._read_commit(vs[-1]):
                if "txn" in action and action["txn"]["appId"] == self.app_id:
                    return action["txn"]["version"]
                if "commitInfo" in action:  # pre-txn commits
                    return (action["commitInfo"]["operationParameters"]
                            .get("epoch"))
            return None
        # JSON prefix fully cleaned: the txn state lives in the
        # checkpoint (the protocol's idempotent-writer mechanism)
        ck = self._usable_checkpoint(upto=None)
        if ck is not None:
            _, _, _, txns = self._checkpoint_state(ck)
            return txns.get(self.app_id)
        return None

    def bucket_expr(self, key_cols: tuple[str, ...]):
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(self.n_buckets)
        ).cast("int")

    def data_path(self, version: int | None = None) -> str | None:
        return self.path if self.current_version() > 0 else None

    def read(self, spark: SparkSession, version: int | None = None,
             buckets: list[int] | None = None) -> DataFrame | None:
        """Current state, or time-travel to after the `version`-th
        commit (1-based, like VersionedParquetTable) by replaying the
        log prefix — the protocol's VERSION AS OF semantics. With
        `buckets`, live files are pruned on their logged
        `partitionValues` (the protocol's data-skipping input): a
        one-bucket point read scans O(that bucket's files), the log
        replay stays the only control-plane cost."""
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
        live = self._live_files(upto=upto)
        if buckets is not None:
            want = {str(b) for b in buckets}
            live = {p: a for p, a in live.items()
                    if a.get("partitionValues", {}).get(BUCKET_COL)
                    in want}
        files = [os.path.join(self.path, p) for p in live]
        if not files:
            return None
        reader = spark.read.option("basePath", self.path)
        cur_meta = self._current_metadata_action()
        if (cur_meta is not None and cur_meta.get("configuration", {})
                .get("schema.evolved") == "true"):
            # evolved table: live files span schema versions — merge
            # footers (paid only after an actual evolution)
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    def read_schema(self, spark: SparkSession):
        """Stored schema from the CONTROL PLANE alone (the current
        metaData action's schemaString — exact Spark types, including
        the bucket partition column): a merge/erase needs only dtypes,
        and the full `read()` pays an O(live-files) file-index
        construction to answer the same question. Returns None when
        nothing is committed."""
        from pyspark.sql import types as T

        meta = self._current_metadata_action()
        if meta is None:
            return None
        return T.StructType.fromJson(json.loads(meta["schemaString"]))

    def commit(self, df: DataFrame, epoch_id: int,
               touched_buckets: list[int] | None = None,
               data_change: bool = True) -> int:
        """Stage `df`'s parquet, move files under `__bucket=N/`, append
        one log version: removes for the replaced files of touched
        buckets (every live file when `touched_buckets is None` — full
        rewrite), adds for the new ones. O(touched) actions.
        `data_change=False` marks the protocol's rearrangement commits
        (compaction): CDF/streaming readers skip them."""
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
            # unbucketed frame: `touched_buckets=None` (the default)
            # stays a full rewrite; an EXPLICIT list (incl. []) is an
            # append — flat files live under __unpartitioned, which the
            # bucket-dir doom filter below never matches, so the
            # caller's append intent survives instead of being
            # silently turned into deleting the prior contents
            df.write.mode("overwrite").parquet(staging)

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
        schema_tag = _fingerprint_tag(df.schema.json())
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
                "dataChange": data_change,
                "tags": {"schemaFingerprint": schema_tag},
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
            removes = [{"remove": {"path": p, "dataChange": data_change,
                                   "deletionTimestamp": adds[0]["add"]
                                   ["modificationTime"] if adds else 0}}
                       for p in sorted(doomed)]

        actions: list[dict] = [{"commitInfo": {
            "operation": ("OPTIMIZE" if not data_change
                          else "MERGE" if delta_version > 0 else "WRITE"),
            "operationParameters": {"epoch": epoch_id},
            "engineInfo": "debezium-server-spark/minimal-delta-writer",
        }}, {"txn": {"appId": self.app_id, "version": epoch_id}}]
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
        else:
            # schema drift (CDC evolution): the protocol requires a new
            # metaData action declaring the evolved schema — readers of
            # later versions otherwise keep projecting the old one.
            # Drift is judged on a NORMALIZED fingerprint (nullability /
            # field-order jitter Spark introduces between micro-batches
            # is not evolution) — else the sticky `schema.evolved` flag
            # would make every later read pay mergeSchema forever.
            cur_meta = self._current_metadata_action()
            if (cur_meta is not None
                    and _schema_fingerprint(cur_meta.get("schemaString", ""))
                    != _schema_fingerprint(df.schema.json())):
                actions.append({"metaData": {
                    **cur_meta,
                    "schemaString": df.schema.json(),
                    # tells read() the table's files span schema
                    # versions without a full-history replay
                    "configuration": {
                        **cur_meta.get("configuration", {}),
                        "schema.evolved": "true"},
                }})
            elif (self._clear_evolved_on_commit and cur_meta is not None
                  and cur_meta.get("configuration", {})
                  .get("schema.evolved") == "true"):
                # a full compaction just rewrote every live file under
                # one schema — the evolved flag (and its mergeSchema
                # cost) no longer applies
                cfg = {k: v for k, v in cur_meta.get(
                    "configuration", {}).items() if k != "schema.evolved"}
                actions.append({"metaData": {
                    **cur_meta,
                    "schemaString": df.schema.json(),
                    "configuration": cfg}})
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
        self._clear_evolved_on_commit = False
        # protocol cadence: checkpoint every `checkpoint_interval`
        # commits so replay stays O(interval) JSON reads
        if (delta_version + 1) % self.checkpoint_interval == 0:
            self.write_checkpoint(delta_version)
        return delta_version + 1

    # ------------------------------------------------------ maintenance

    def live_file_counts(self, buckets: list[int] | None = None
                         ) -> dict[int, int]:
        """Live data files per bucket from the logged partitionValues
        (restricted to `buckets` when given) — the auto-maintenance
        policy's trigger input. Control-plane only: one log replay, no
        data files opened."""
        want = None if buckets is None else {str(b) for b in buckets}
        out: dict[int, int] = {}
        for _p, a in self._live_files().items():
            bv = a.get("partitionValues", {}).get(BUCKET_COL)
            if bv is None or (want is not None and bv not in want):
                continue
            out[int(bv)] = out.get(int(bv), 0) + 1
        return out

    def compact(self, spark: SparkSession,
                buckets: list[int] | None = None) -> int:
        """The protocol's OPTIMIZE (bin-packing compaction): rewrite
        each selected bucket's accumulated files into one, as a
        `dataChange=false` commit — CDF/streaming readers skip it, the
        txn action re-records the LAST epoch so idempotent replay is
        unaffected. The 100 TB maintenance lever against micro-batch
        small files. Returns the new commit count, or 0 when empty."""
        # control-plane preflight: schema (bucketed or flat?) and the
        # default bucket list both come from the log — constructing
        # the FULL read here cost O(live files) at every PARTIAL
        # compaction (measured: the delta compact probe's wall grew
        # with history depth in tools/scaling_lake.py purely from
        # this file-index build; the pruned read below is the only
        # data-plane touch a partial compact needs)
        schema = self.read_schema(spark)
        if schema is None:
            return 0
        if BUCKET_COL not in schema.fieldNames():
            # flat table: every compaction is a full rewrite (the
            # commit's touched_buckets=None removes all files), even
            # when the caller asked for specific buckets — so the
            # sticky evolved flag is clearable here too
            cur = self.read(spark)  # full read IS the rewrite input
            if cur is None:
                return 0
            sub = cur.coalesce(1)
            buckets = None
            full_rewrite = True
        else:
            full_rewrite = buckets is None
            if buckets is None:
                buckets = sorted(self.live_file_counts())
            if not buckets:
                return 0
            # pruned read: a partial compaction lists only its own
            # buckets' files (and pins the transaction snapshot)
            pruned = self.read(spark, buckets=list(buckets))
            if pruned is None:  # requested buckets hold no files
                return 0
            sub = pruned.repartition(len(buckets), F.col(BUCKET_COL))
        # a full compaction rewrites every live file under one schema —
        # the sticky evolved flag can be dropped in the same commit. A
        # PARTIAL compaction can drop it too when every untouched live
        # file provably already carries the current (normalized)
        # schema: proven from the logged add tags (schemaFingerprint,
        # stamped by commit()), no footers opened. Pre-tag adds have no
        # fingerprint and keep the flag — conservative by construction.
        clear_evolved = full_rewrite
        if not clear_evolved and buckets is not None:
            cur_meta = self._current_metadata_action()
            if (cur_meta is not None and cur_meta.get("configuration", {})
                    .get("schema.evolved") == "true"):
                target = _fingerprint_tag(sub.schema.json())
                dirs = {f"{BUCKET_COL}={b}" for b in buckets}
                clear_evolved = all(
                    (a.get("tags") or {}).get("schemaFingerprint") == target
                    for p, a in self._live_files().items()
                    if p.split("/", 1)[0] not in dirs)
        self._clear_evolved_on_commit = clear_evolved
        return self.commit(sub, epoch_id=self.last_epoch() or 0,
                           touched_buckets=buckets, data_change=False)

    def vacuum(self, retention_seconds: float = 7 * 86400) -> list[str]:
        """Physically delete files removed from the log, SKIPPING files
        younger than `retention_seconds` (Delta's default: 7 days).
        The window is not just a time-travel courtesy — it is a
        CORRECTNESS guard for concurrent writers: another writer's data
        files are moved into the table (`os.replace` in commit())
        BEFORE its log record lands, so a zero-retention vacuum racing
        that gap would delete an in-flight commit's data. Pass
        `retention_seconds=0` only when no other writer can be active.
        Returns deleted relative paths."""
        import time as _time

        cutoff = _time.time() - retention_seconds
        live = set(self._live_files())
        deleted = []
        for dirname in os.listdir(self.path):
            d = os.path.join(self.path, dirname)
            if dirname == "_delta_log" or not os.path.isdir(d):
                continue
            for fname in os.listdir(d):
                rel = f"{dirname}/{fname}"
                if rel in live or not fname.endswith(".parquet"):
                    continue
                full = os.path.join(d, fname)
                if os.stat(full).st_mtime > cutoff:
                    continue  # inside the retention window
                os.remove(full)
                deleted.append(rel)
        return deleted
