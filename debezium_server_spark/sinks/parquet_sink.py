"""Keyed parquet table sink: the upsert/append/delete materializer.

This is the engine's correctness-bearing sink — the analog of the
reference's PK-table writers (Fluss upsert/append modes
FlussChangeConsumer.java:170-220,256-282; JDBC insert/upsert
JdbcChangeConsumer.java:102-128; Infinispan keyed putAll
InfinispanSinkConsumer.java:116-121).

Without Delta in this container, state lives in versioned parquet
directories with an atomically-renamed `_VERSION` pointer: each
micro-batch produces `v{N+1}/` and flips the pointer, so readers always
see a complete version and a re-run of the same epoch (at-least-once
replay) converges to the same state (idempotent — effectively-once,
SURVEY.md §3.2).

Scale design — the state is HASH-BUCKETED by key (`__bucket =
pmod(xxhash64(keys), n_buckets)`, a dir-partition column), and a commit
only REWRITES buckets the batch touches; every untouched bucket is
HARD-LINKED from the previous version (an inode-level metadata op, the
same trick Delta/Iceberg snapshots use by reusing unchanged data files).
Per-epoch cost is therefore O(touched buckets), not O(table): a 1000-row
micro-batch against a 100 TB table rewrites ≲ batch-key-count buckets
while the other thousands of buckets carry over for free. The merge
itself reads ONLY the touched buckets (partition-pruned scan on the
bucket column) and shuffles on the same key the state is bucketed by.
On a real cluster the same `handle` body targets a Delta/Iceberg table
via MERGE INTO with files pruned by key stats.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from debezium_server_spark.operators.materialize import merge_state
from debezium_server_spark.sinks.base import BaseSink, register_sink

SEQ_COL = "__seq"
BUCKET_COL = "__bucket"


class VersionedParquetTable:
    """A hash-bucketed parquet table with atomic version flips
    (poor-man's Delta: versions are snapshots, unchanged buckets are
    hard-linked between versions instead of rewritten)."""

    def __init__(self, path: str, n_buckets: int = 16, retain: int = 2):
        self.path = path
        os.makedirs(path, exist_ok=True)
        # bucket count is fixed at table creation; later instances follow
        # the persisted value (changing it would scatter existing keys)
        self.n_buckets = self._meta().get("n_buckets", n_buckets)
        #: snapshots kept for time travel (hard-linked — ~free on disk)
        self.retain = retain

    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def _meta(self) -> dict:
        try:
            with open(os.path.join(self.path, "_META")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _write_meta(self) -> None:
        if not self._meta():
            with open(os.path.join(self.path, "_META"), "w") as f:
                json.dump({"n_buckets": self.n_buckets}, f)

    def current_version(self) -> int:
        try:
            with open(self._pointer) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return 0

    def data_path(self, version: int | None = None) -> str | None:
        v = self.current_version() if version is None else version
        return os.path.join(self.path, f"v{v}") if v > 0 else None

    def read(self, spark: SparkSession, version: int | None = None,
             buckets: list[int] | None = None) -> DataFrame | None:
        """Read the current snapshot, or time-travel to an earlier
        `version` (each epoch commit is a full snapshot whose untouched
        buckets are hard links — retained versions cost ~0 storage, so
        as-of reads are free until _gc drops the name). With `buckets`,
        only those `__bucket=N` partition dirs are even LISTED — the
        same point-read pruning interface the lake-layer twins expose."""
        if version is not None and not os.path.isdir(
            os.path.join(self.path, f"v{version}")
        ):
            raise ValueError(
                f"version {version} not retained for {self.path} "
                f"(current {self.current_version()}; raise `retain` to keep more)"
            )
        p = self.data_path(version)
        if not p:
            return None
        try:
            if buckets is not None:
                dirs = [os.path.join(p, f"{BUCKET_COL}={b}")
                        for b in buckets
                        if os.path.isdir(os.path.join(p, f"{BUCKET_COL}={b}"))]
                if not dirs:
                    return None
                return spark.read.option("basePath", p).parquet(*dirs)
            return spark.read.parquet(p)
        except AnalysisException:
            return None  # fully-deleted table: version dir has no data

    def bucket_expr(self, key_cols: tuple[str, ...]):
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(self.n_buckets)
        ).cast("int")

    def read_schema(self, spark: SparkSession) -> T.StructType | None:
        """Stored schema WITHOUT constructing the full-table read: one
        parquet footer (plus the bucket partition column the full read
        would infer). The full `read()` builds a file index over every
        live file — an O(live-files) listing job that a merge/erase
        needs only for dtypes; this is the O(1) substitute. Key
        columns never change dtype across evolution (handle() pins
        them), so any single footer answers the dtype question."""
        p = self.data_path()
        if not p:
            return None
        for root, dirs, files in os.walk(p):
            dirs.sort()
            for fn in sorted(files):
                if fn.endswith(".parquet") and not fn.startswith("."):
                    schema = spark.read.parquet(
                        os.path.join(root, fn)).schema
                    if (f"{BUCKET_COL}=" in root
                            and BUCKET_COL not in schema.fieldNames()):
                        schema = schema.add(BUCKET_COL, T.IntegerType())
                    return schema
        return None

    def commit(self, df: DataFrame, epoch_id: int,
               touched_buckets: list[int] | None = None) -> int:
        """Write `df` (which must cover every row of `touched_buckets`)
        partitioned by bucket, hard-link all other buckets from the
        current version, then flip the pointer. `touched_buckets=None`
        rewrites everything (first commit / full-table operations)."""
        old = self.data_path()
        new_version = self.current_version() + 1
        out = os.path.join(self.path, f"v{new_version}")
        flat = BUCKET_COL not in df.columns
        if flat:
            # unbucketed frame: `touched_buckets=None` (the default) is
            # a full rewrite; an EXPLICIT list (incl. []) is an append —
            # the caller's choice must not be silently overridden into
            # deleting the table's prior contents
            df.write.mode("overwrite").parquet(out)
        else:
            df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(out)
        if old and touched_buckets is not None:
            touched_names = {f"{BUCKET_COL}={b}" for b in touched_buckets}
            for name in os.listdir(old):
                if name.startswith(f"{BUCKET_COL}=") and name not in touched_names:
                    self._link_dir(os.path.join(old, name), os.path.join(out, name))
                elif (flat and os.path.isfile(os.path.join(old, name))
                      and name.endswith(".parquet")):
                    # flat append: carry the old version's root files
                    # forward by hard link (spark part-file names embed
                    # a per-write uuid — no collisions)
                    try:
                        os.link(os.path.join(old, name),
                                os.path.join(out, name))
                    except OSError:
                        shutil.copy2(os.path.join(old, name),
                                     os.path.join(out, name))
        self._write_meta()
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump({"version": new_version, "epoch": epoch_id}, f)
        os.replace(tmp, self._pointer)  # atomic flip
        self._gc(keep=new_version, retain=self.retain)
        return new_version

    @staticmethod
    def _link_dir(src: str, dst: str) -> None:
        os.makedirs(dst, exist_ok=True)
        for name in os.listdir(src):
            s, d = os.path.join(src, name), os.path.join(dst, name)
            if os.path.isfile(s) and not os.path.exists(d):
                try:
                    os.link(s, d)  # same-filesystem: metadata-only
                except OSError:
                    shutil.copy2(s, d)

    def last_epoch(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return json.load(f).get("epoch")
        except FileNotFoundError:
            return None

    def live_file_counts(self, buckets: list[int] | None = None
                         ) -> dict[int, int]:
        """Live parquet files per bucket (restricted to `buckets` when
        given) — the auto-maintenance policy's trigger input. O(listed
        buckets), a pure directory listing."""
        d = self.data_path()
        if d is None:
            return {}
        want = None if buckets is None else set(buckets)
        out: dict[int, int] = {}
        for name in os.listdir(d):
            if not name.startswith(f"{BUCKET_COL}="):
                continue
            b = int(name.split("=", 1)[1])
            if want is not None and b not in want:
                continue
            out[b] = sum(1 for f in os.listdir(os.path.join(d, name))
                         if f.endswith(".parquet"))
        return out

    def compact(self, spark: SparkSession,
                buckets: list[int] | None = None) -> int:
        """Bin-packing compaction parity with the lake layers: rewrite
        the selected buckets' files into one per bucket as a new
        version (same epoch — replay semantics unaffected). A partial
        compaction reads and rewrites ONLY its buckets; the rest
        carry forward by hard link."""
        cur = self.read(spark, buckets=buckets)
        if cur is None:
            return self.current_version()
        if BUCKET_COL not in cur.columns:
            return self.commit(cur.coalesce(1),
                               epoch_id=self.last_epoch() or 0)
        if buckets is None:
            buckets = [r[0] for r in
                       cur.select(BUCKET_COL).distinct().collect()]
        if not buckets:
            return self.current_version()
        sub = cur.repartition(len(buckets), F.col(BUCKET_COL))
        return self.commit(sub, epoch_id=self.last_epoch() or 0,
                           touched_buckets=list(buckets))

    def _gc(self, keep: int, retain: int = 2) -> None:
        # hard links make retained snapshots ~free; rmtree only drops
        # names, shared inodes survive in newer versions
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= keep - retain:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)


@dataclass(frozen=True)
class MaintenancePolicy:
    """Auto-maintenance for a 100 TB deployment: manual compaction/
    expiry/vacuum calls don't scale to thousands of tables — the sink
    applies the policy inside `handle`, bounded to the epoch's touched
    buckets (compaction probe) or a modular epoch cadence (expiry,
    vacuum), so the added per-batch cost is O(touched)/amortized-K,
    never O(table).

    - `compact_files_per_bucket`: after each merge, probe the TOUCHED
      buckets' live-file counts and compact any bucket exceeding the
      threshold (partial compaction — only offending buckets rewrite).
    - `expire_every_epochs` + `expire_condition`: run the TTL pass
      (`expire_where`) on every Kth epoch.
    - `vacuum_every_epochs`: physically clean up unreferenced files on
      every Kth epoch (iceberg: expire_snapshots(keep_snapshots) then
      vacuum; delta: vacuum). `vacuum_retention_seconds=0` is safe
      only in the embedded single-writer deployment this sink runs in
      — a multi-writer lake keeps the 7-day default."""

    compact_files_per_bucket: int | None = None
    expire_every_epochs: int | None = None
    expire_condition: str | None = None
    vacuum_every_epochs: int | None = None
    vacuum_retention_seconds: float = 0.0
    keep_snapshots: int = 2


@register_sink
class ParquetUpsertSink(BaseSink):
    """PK-mode materializer: per-destination upsert/delete into versioned
    hash-bucketed parquet tables, one table per destination under
    `root_path`. Only buckets containing batch keys are rewritten per
    epoch; see the module docstring for the scale argument."""

    name = "parquet-upsert"
    tombstone_support = False  # tombstones dropped by prepare()

    def __init__(self, root_path: str, key_fields: tuple[str, ...] = ("id",),
                 order_cols: tuple[str, ...] = ("value.source.lsn", "value.ts_ms"),
                 n_buckets: int = 16, table_format: str = "versioned",
                 maintenance: MaintenancePolicy | None = None,
                 maintenance_compact_files_per_bucket: int | str | None = None,
                 maintenance_expire_every_epochs: int | str | None = None,
                 maintenance_expire_condition: str | None = None,
                 maintenance_vacuum_every_epochs: int | str | None = None,
                 maintenance_vacuum_retention_seconds: float | str = 0.0,
                 maintenance_keep_snapshots: int | str = 2,
                 **kwargs):
        super().__init__(**kwargs)
        self.root_path = root_path
        self.key_fields = key_fields
        self.order_cols = order_cols
        self.n_buckets = n_buckets
        if table_format not in ("versioned", "delta", "iceberg"):
            raise ValueError(f"table_format must be versioned|delta|iceberg, "
                             f"got {table_format!r}")
        self.table_format = table_format
        # the flat `maintenance_*` kwargs exist for the config path
        # (assembly passes dotted string properties); a programmatic
        # caller passes the dataclass directly
        opt = lambda v: None if v is None else int(v)
        if maintenance is None and any(
                v is not None for v in (
                    maintenance_compact_files_per_bucket,
                    maintenance_expire_every_epochs,
                    maintenance_vacuum_every_epochs)):
            maintenance = MaintenancePolicy(
                compact_files_per_bucket=opt(
                    maintenance_compact_files_per_bucket),
                expire_every_epochs=opt(maintenance_expire_every_epochs),
                expire_condition=maintenance_expire_condition,
                vacuum_every_epochs=opt(maintenance_vacuum_every_epochs),
                vacuum_retention_seconds=float(
                    maintenance_vacuum_retention_seconds),
                keep_snapshots=int(maintenance_keep_snapshots))
        self.maintenance = maintenance

    def _table(self, destination: str):
        safe = destination.replace("/", "_")
        if self.table_format == "delta":
            from debezium_server_spark.sinks.delta_log import DeltaLogTable

            return DeltaLogTable(
                os.path.join(self.root_path, safe), n_buckets=self.n_buckets
            )
        if self.table_format == "iceberg":
            from debezium_server_spark.sinks.iceberg_meta import IcebergTable

            return IcebergTable(
                os.path.join(self.root_path, safe), n_buckets=self.n_buckets
            )
        return VersionedParquetTable(
            os.path.join(self.root_path, safe), n_buckets=self.n_buckets
        )

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        # Per-destination grouping (KinesisChangeConsumer.java:136): the
        # destination list is tiny control data — collecting it is fine.
        destinations = [r[0] for r in df.select("destination").distinct().collect()]
        for dest in destinations:
            table = self._table(dest)
            if table.last_epoch() == epoch_id:
                continue  # exact replay of a committed epoch: skip (idempotent)
            events = df.filter(F.col("destination") == dest)
            # Reduce the batch to the latest event per key via map-side
            # combinable max_by (see operators/materialize.py), then
            # flatten to row shape + op + seq for the merge. Delete events
            # carry a null `after`, so the key columns are re-filled from
            # the key struct (always present).
            key_aliases = [F.col(f"key.{k}").alias(f"__key_{k}") for k in self.key_fields]
            reduced = (
                events.filter(F.col("value").isNotNull())
                .select(
                    *key_aliases,
                    F.struct(F.col("value.op").alias("op"), F.col("value.after").alias("after")).alias("p"),
                    F.struct(*[F.col(c) for c in self.order_cols]).alias("__ord"),
                )
                .groupBy(*[f"__key_{k}" for k in self.key_fields])
                .agg(F.max_by("p", F.col("__ord")).alias("__latest"))
            )
            batch = reduced.select(
                F.col("__latest.after.*"),
                *[F.col(f"__key_{k}") for k in self.key_fields],
                F.col("__latest.op").alias("op"),
            )
            for k in self.key_fields:
                batch = batch.withColumn(k, F.coalesce(F.col(k), F.col(f"__key_{k}")))
            batch = batch.drop(*[f"__key_{k}" for k in self.key_fields])
            # control-plane schema probe: the merge needs the stored
            # KEY DTYPES (pinning below) and, later, only the TOUCHED
            # buckets' rows — constructing the full-table read here
            # cost O(live files) of file-index work per micro-batch
            # (measured in tools/scaling_lake.py as merge wall growing
            # with history depth)
            stored_schema = table.read_schema(spark)
            # The bucket function is PINNED to the table's creation-time
            # key dtypes: xxhash64 hashes the binary representation, so
            # an upstream key widening (int -> long envelopes after a
            # source ALTER) would hash the same logical key into a
            # DIFFERENT bucket — stranding the old row — and write
            # long-typed files into an int-typed table (the next merge
            # read crashes). Cast the batch keys back to the stored
            # dtypes; a key the stored type cannot represent is a real
            # domain overflow that needs a table migration — raise
            # loudly instead of silently rehashing.
            if stored_schema is not None:
                cur_types = {f.name: f.dataType.simpleString()
                             for f in stored_schema.fields}
                batch_types = dict(batch.dtypes)
                for k in self.key_fields:
                    if batch_types[k] != cur_types[k]:
                        # overflow check by try_cast round trip (ANSI
                        # mode throws on a plain downcast, non-ANSI
                        # WRAPS — try_cast nulls in both, and the
                        # back-cast comparison catches wraps): a value
                        # the stored type represents exactly survives
                        # cast-there-and-back
                        rt = (F.col(k).try_cast(cur_types[k])
                              .try_cast(batch_types[k]))
                        overflow = batch.filter(
                            F.col(k).isNotNull()
                            & (rt.isNull() | (rt != F.col(k)))
                        ).count()
                        if overflow:
                            raise ValueError(
                                f"{overflow} row(s) of key column "
                                f"{k!r} do not fit the table's stored "
                                f"type {cur_types[k]} ({dest}): key-"
                                f"domain overflow requires a table "
                                f"migration, not a silent rehash")
                        batch = batch.withColumn(
                            k, F.col(k).cast(cur_types[k]))
            batch = (
                batch.withColumn(SEQ_COL, F.lit(epoch_id).cast("long"))
                .withColumn(BUCKET_COL, table.bucket_expr(self.key_fields))
            )
            touched: list[int] | None = None
            if stored_schema is None:
                merged = batch.filter(F.col("op") != "d").drop("op")
                table.commit(merged, epoch_id, touched_buckets=None)
            else:
                # micro-batches touch few keys → few buckets; the bucket
                # list is tiny control data (≤ n_buckets ints)
                touched = [
                    r[0] for r in batch.select(BUCKET_COL).distinct().collect()
                ]
                # bucket-PRUNED read of the merge input: untouched
                # buckets' files (and, on the lake layers, their
                # manifests/log entries) are never listed — the
                # micro-batch merge costs O(touched buckets), not
                # O(table)
                current_touched = table.read(spark, buckets=touched)
                if current_touched is None:  # touched buckets all new
                    current_touched = spark.createDataFrame(
                        [], stored_schema)
                merged = merge_state(
                    current_touched, batch, key_cols=self.key_fields, seq_col=SEQ_COL
                )
                table.commit(merged, epoch_id, touched_buckets=touched)
            if self.maintenance is not None:
                self._run_maintenance(spark, dest, table, epoch_id, touched)

    def _run_maintenance(self, spark: SparkSession, dest: str, table,
                         epoch_id: int,
                         touched: list[int] | None) -> None:
        """Apply the MaintenancePolicy after this destination's merge.
        The compaction probe is bounded to the epoch's TOUCHED buckets
        (the only ones whose file count can have changed); expiry and
        vacuum run on a modular epoch cadence. Maintenance commits
        preserve the last stream epoch (compaction commits re-record
        it; erase/expiry epochs are negative), so the idempotent
        replay check in `handle` is unaffected."""
        pol = self.maintenance
        if pol.compact_files_per_bucket is not None and touched:
            counts = table.live_file_counts(buckets=touched)
            over = sorted(b for b, n in counts.items()
                          if n > pol.compact_files_per_bucket)
            if over:
                table.compact(spark, buckets=over)
        if (pol.expire_every_epochs and pol.expire_condition
                and epoch_id % pol.expire_every_epochs == 0):
            self.expire_where(spark, dest, pol.expire_condition)
        if pol.vacuum_every_epochs and epoch_id % pol.vacuum_every_epochs == 0:
            if hasattr(table, "expire_snapshots"):
                table.expire_snapshots(keep_last=pol.keep_snapshots)
            if hasattr(table, "vacuum"):
                table.vacuum(
                    retention_seconds=pol.vacuum_retention_seconds)

    def erase_keys(
        self, spark: SparkSession, destination: str, keys_df: DataFrame
    ) -> int:
        """Right-to-erasure (GDPR Art. 17) on the materialized state:
        hard-delete every row matching `keys_df` (columns = key_fields)
        from the CURRENT snapshot, as a new version touching only the
        buckets those keys hash into. Erasure epochs are tagged negative
        so they never collide with stream epoch ids.

        NOTE on retention: earlier hard-linked versions still reference
        the rows until `retain` generations age them out — a compliance
        deployment sets retain=1 on erasure-bearing tables (or re-commits
        retain times). Returns the number of rows erased."""
        table = self._table(destination)
        # control-plane schema probe (see handle): an erase of k keys
        # must cost O(their buckets), and the full read's file index
        # is O(live files)
        stored_schema = table.read_schema(spark)
        if stored_schema is None:
            return 0
        # CAST the keys to the table's own key dtypes first: xxhash64
        # hashes the binary representation, so a long-typed key frame
        # against an int-keyed table buckets DIFFERENTLY and the erase
        # silently misses rows (found by the cross-layer differential
        # test, round 7) — a silent GDPR non-erasure
        cur_types = {f.name: f.dataType.simpleString()
                     for f in stored_schema.fields}
        # Same try_cast round trip as the merge path: under ANSI a
        # plain .cast of an out-of-range key would abort the WHOLE
        # erase (including all valid keys); non-ANSI would WRAP and
        # the left_anti join could hard-delete a DIFFERENT row. A key
        # the stored type cannot represent exactly cannot match any
        # stored row, so it is a no-op by construction — drop it
        # before casting instead of erroring or wrapping.
        keys_typed = dict(keys_df.dtypes)
        keys = keys_df
        for k in self.key_fields:
            if keys_typed[k] != cur_types[k]:
                rt = (F.col(k).try_cast(cur_types[k])
                      .try_cast(keys_typed[k]))
                keys = keys.filter(
                    F.col(k).isNull() | (rt.isNotNull() & (rt == F.col(k))))
        keys = keys.select(
            *[F.col(k).cast(cur_types[k]).alias(k)
              for k in self.key_fields]).distinct()
        keyed = keys.withColumn("__kb", table.bucket_expr(self.key_fields))
        touched = [r[0] for r in keyed.select("__kb").distinct().collect()]
        if not touched:
            return 0
        # bucket-pruned read: an erase of k keys scans O(their
        # buckets), not the table
        in_scope = table.read(spark, buckets=touched)
        if in_scope is None:
            return 0  # none of the target buckets exist
        survivors = in_scope.join(keys, list(self.key_fields), "left_anti")
        # one action instead of two: the erased rows are exactly the
        # semi-join complement of the anti-join survivors (keys is
        # distinct, so the semi/anti pair partitions in_scope)
        erased = in_scope.join(
            keys, list(self.key_fields), "left_semi").count()
        erase_epoch = -(table.current_version() + 1)
        table.commit(survivors, erase_epoch, touched_buckets=touched)
        return erased

    def expire_where(
        self, spark: SparkSession, destination: str, condition: str
    ) -> int:
        """Retention/TTL pass: hard-delete every row matching the SQL
        `condition` (e.g. "event_ts < '2024-01-01'") from the current
        snapshot. Unlike `erase_keys` the predicate can touch any column,
        so every bucket holding matches rewrites — run it at retention
        cadence (daily), not per batch. Negative-epoch tagged like
        erasure. Returns rows expired."""
        table = self._table(destination)
        current = table.read(spark)
        if current is None:
            return 0
        # ONE aggregation action replaces the previous THREE (doomed
        # bucket-list collect + in_scope.count + survivors.count): the
        # per-bucket stats are ≤ n_buckets control rows. Semantics are
        # unchanged, including the NULL edge: a bucket is touched only
        # when the condition is definitively TRUE for some row (`doomed`),
        # and within a touched bucket every row that is not definitively
        # kept (condition FALSE) is expired — NULL-condition rows in
        # untouched buckets survive untouched, exactly as before.
        cond = F.expr(condition)
        stats = (current.groupBy(BUCKET_COL)
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.count_if(cond).alias("doomed"),
                      F.count_if(~cond).alias("kept"))
                 .collect())
        touched = sorted(r[BUCKET_COL] for r in stats if r["doomed"] > 0)
        if not touched:
            return 0
        expired = sum(r["n"] - r["kept"] for r in stats if r["doomed"] > 0)
        survivors = (current.filter(F.col(BUCKET_COL).isin(touched))
                     .filter(f"NOT ({condition})"))
        table.commit(survivors, -(table.current_version() + 1),
                     touched_buckets=touched)
        return expired

    def read_table(
        self, spark: SparkSession, destination: str, version: int | None = None
    ) -> DataFrame | None:
        """Latest state, or `version=` for time travel (what did this
        table look like after epoch k's commit — the read-side analog of
        `state_as_of_day15`, but on the physical snapshot chain)."""
        df = self._table(destination).read(spark, version=version)
        return df.drop(SEQ_COL, BUCKET_COL) if df is not None else None


@register_sink
class ParquetAppendSink(BaseSink):
    """Log-table mode (Fluss append mode): every event appended as a row,
    partitioned by destination — the scan path prunes partitions when a
    single stream is read back."""

    name = "parquet-append"
    tombstone_support = False

    def __init__(self, root_path: str, **kwargs):
        super().__init__(**kwargs)
        self.root_path = root_path

    def handle(self, df: DataFrame, epoch_id: int) -> None:
        (
            df.withColumn("__epoch", F.lit(epoch_id).cast("long"))
            .write.mode("append")
            .partitionBy("destination")
            .parquet(self.root_path)
        )

    def compact(self, spark: SparkSession,
                target_file_bytes: int = 128 << 20) -> dict[str, tuple[int, int]]:
        """Small-file compaction (the OPTIMIZE analog): every micro-batch
        appends at least one file per partition, so a day of 1-minute
        triggers leaves ~1440 tiny files per destination — death by
        open() at 100 TB. Rewrites each destination partition into
        ⌈bytes/target⌉ files. Maintenance operation: run while the
        stream is paused (or against a snapshot copy); the per-partition
        swap is not atomic for concurrent readers, which is exactly the
        contract plain-parquet OPTIMIZE jobs have without a table format.
        Returns {destination: (files_before, files_after)}."""
        stats: dict[str, tuple[int, int]] = {}
        for name in os.listdir(self.root_path):
            pdir = os.path.join(self.root_path, name)
            if not (name.startswith("destination=") and os.path.isdir(pdir)):
                continue
            files = [f for f in os.listdir(pdir)
                     if f.endswith(".parquet") and not f.startswith(".")]
            if len(files) <= 1:
                continue
            total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
            n_out = max(1, -(-total // target_file_bytes))
            if n_out >= len(files):
                continue
            tmp = pdir + ".__compact_tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            spark.read.parquet(pdir).coalesce(int(n_out)).write.parquet(tmp)
            shutil.rmtree(pdir)
            os.rename(tmp, pdir)
            after = len([f for f in os.listdir(pdir)
                         if f.endswith(".parquet") and not f.startswith(".")])
            stats[name.split("=", 1)[1]] = (len(files), after)
        return stats
