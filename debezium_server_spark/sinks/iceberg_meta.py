"""Minimal Apache Iceberg v2 table — the second lake-format storage
layer for `ParquetUpsertSink` (`table_format="iceberg"`), implemented
against the PUBLIC Iceberg table spec (iceberg.apache.org/spec/) with
no iceberg library (pyiceberg is absent in this container; NEXT.md
blocked-item list). The reference reaches lake-house tables through
its Fluss/JDBC PK-table writers (`FlussChangeConsumer.java:256-313`
MERGE semantics); this gives that materialization Iceberg's on-disk
contract, exactly as `sinks/delta_log.py` gives it Delta's.

Layout (HadoopCatalog / filesystem-table convention):

  {path}/data/__bucket=N/part-*.parquet      immutable data files
  {path}/metadata/v{V}.metadata.json         table metadata, one per commit
  {path}/metadata/version-hint.text          latest V (reader entry point)
  {path}/metadata/snap-{sid}-1-{token}.avro  manifest list (one per snapshot)
  {path}/metadata/{token}-b{N}.avro          one manifest PER BUCKET
  {path}/metadata/{token}-del.avro           delete-only manifest (full rewrite)

All Avro files are real Object Container Files written by
`functions/avro_codec.write_container` with the spec's field-ids in
the schema JSON — and, unlike the Delta twin, they are validated by an
EXTERNAL reader: the avro-1.12.1.jar bundled with Spark reads them
back via `org.apache.avro.file.DataFileReader` in
`tests/test_iceberg_meta.py`.

Scale contract (same O(touched) argument as the Delta twin, in
Iceberg's native vocabulary): manifests are keyed one-per-bucket, so a
commit touching k of B buckets writes k new manifests (each holding
that bucket's ADDED files plus DELETED entries for the files it
replaces — deleted entries keep their original data sequence numbers
per the v2 spec) and CARRIES FORWARD the other B-k manifests by
reference in the new manifest list. Manifest reuse across snapshots is
exactly the spec's model; untouched buckets cost one manifest-list row
(a bounded control frame: B entries). Readers prune by the manifest
list's `partitions` field summaries (lower/upper bound = the bucket id
as the spec's 4-byte little-endian single-value serialization), so a
point lookup opens one manifest.

Commit protocol: `v{V+1}.metadata.json` is created with
`open(path, "x")` — put-if-absent, the HadoopTableOperations
rename-if-absent primitive; a concurrent writer loses with
FileExistsError instead of corrupting, and `version-hint.text` is
repointed only after the metadata lands. Epoch idempotence rides the
snapshot `summary` (`dss.epoch`), the spec's application-property
channel — the analog of the Delta twin's `txn` action.

Time travel: every snapshot (id, sequence number, manifest list,
summary) stays in the current metadata JSON, so `read(version=k)`
resolves the k-th snapshot's manifest list directly — the spec's
snapshot-log mechanism.
"""

from __future__ import annotations

import json
import os
import shutil
import struct as _struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.functions.avro_codec import (
    read_container,
    write_container,
)

BUCKET_COL = "__bucket"

# ---------------------------------------------------------- spec schemas
#
# Field ids are the spec's fixed ids (Appendix C "Avro" of the Iceberg
# table spec): manifest_entry 0/1/3/4/2, data_file 134/100/101/102/
# 103/104, manifest_file 500-519. Our codec ignores the attributes;
# real readers require them.

_FIELD_SUMMARY = {
    "type": "record", "name": "r508",
    "fields": [
        {"name": "contains_null", "type": "boolean", "field-id": 509},
        {"name": "contains_nan", "type": ["null", "boolean"],
         "default": None, "field-id": 518},
        {"name": "lower_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 510},
        {"name": "upper_bound", "type": ["null", "bytes"],
         "default": None, "field-id": 511},
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions",
         "type": ["null", {"type": "array", "items": _FIELD_SUMMARY,
                           "element-id": 508}],
         "default": None, "field-id": 507},
    ],
}

# The manifest partition record mirrors the TABLE's partition spec
# (spec Appendix C: r102's fields are the spec fields): the bucketed
# sink path declares the __bucket field; a table whose spec has NO
# fields (flat/unpartitioned — the test-convenience path) gets the
# strict empty r102, chosen per table in `_write_manifest`.
_PARTITION_RECORD = {
    "type": "record", "name": "r102",
    "fields": [
        {"name": BUCKET_COL, "type": ["null", "int"],
         "default": None, "field-id": 1000},
    ],
}

_EMPTY_PARTITION_RECORD = {"type": "record", "name": "r102", "fields": []}


def _entry_schema(spec_empty: bool) -> dict:
    """MANIFEST_ENTRY_SCHEMA with r102 matching the table's partition
    spec: the declared __bucket field for bucketed specs, the strict
    EMPTY record when the spec has no fields."""
    if not spec_empty:
        return MANIFEST_ENTRY_SCHEMA
    schema = json.loads(json.dumps(MANIFEST_ENTRY_SCHEMA))
    data_file = next(f for f in schema["fields"]
                     if f["name"] == "data_file")
    part = next(f for f in data_file["type"]["fields"]
                if f["name"] == "partition")
    part["type"] = dict(_EMPTY_PARTITION_RECORD)
    return schema

_DATA_FILE = {
    "type": "record", "name": "r2",
    "fields": [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
        {"name": "partition", "type": _PARTITION_RECORD, "field-id": 102},
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
    ],
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "type": _DATA_FILE, "field-id": 2},
    ],
}

# manifest_entry.status values (spec)
ST_EXISTING, ST_ADDED, ST_DELETED = 0, 1, 2


# ------------------------------------------------------- schema mapping


def strip_field_ids(node):
    """Schema tree without id assignments — the shape two schemas are
    compared on to decide whether evolution happened."""
    if isinstance(node, dict):
        return {k: strip_field_ids(v) for k, v in node.items()
                if k not in ("id", "element-id", "key-id", "value-id",
                             "schema-id")}
    if isinstance(node, list):
        return [strip_field_ids(x) for x in node]
    return node


def iceberg_schema_of(schema: T.StructType, base: dict | None = None,
                      last_column_id: int = 0) -> tuple[dict, int]:
    """Spark schema → Iceberg schema JSON with spec field-ids. Fresh
    tables assign ids depth-first from 1. With `base` (the table's
    current Iceberg schema) this performs ID-STABLE EVOLUTION: a field
    that exists in `base` under the same name (at the same nesting
    path) KEEPS its id — the spec's column-identity rule, which makes
    add-column / type-promotion drift safe — and only genuinely new
    fields draw fresh ids after `last_column_id`. Returns
    (schema dict, last column id)."""
    counter = {"id": last_column_id if base is not None else 0}

    def nid() -> int:
        counter["id"] += 1
        return counter["id"]

    def conv(dt: T.DataType, cur):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.BinaryType):
            return "binary"
        if isinstance(dt, T.DateType):
            return "date"
        if isinstance(dt, T.TimestampType):
            return "timestamptz"  # Spark timestamps are UTC-adjusted
        if isinstance(dt, T.TimestampNTZType):
            return "timestamp"
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision}, {dt.scale})"
        if isinstance(dt, T.StructType):
            cur_fields = ({f["name"]: f for f in cur["fields"]}
                          if isinstance(cur, dict)
                          and cur.get("type") == "struct" else {})
            return {"type": "struct",
                    "fields": [field(f, cur_fields.get(f.name))
                               for f in dt.fields]}
        if isinstance(dt, T.ArrayType):
            cur_list = (cur if isinstance(cur, dict)
                        and cur.get("type") == "list" else None)
            return {"type": "list",
                    "element-id": (cur_list["element-id"] if cur_list
                                   else nid()),
                    "element": conv(dt.elementType,
                                    cur_list and cur_list["element"]),
                    "element-required": not dt.containsNull}
        if isinstance(dt, T.MapType):
            cur_map = (cur if isinstance(cur, dict)
                       and cur.get("type") == "map" else None)
            return {"type": "map",
                    "key-id": cur_map["key-id"] if cur_map else nid(),
                    "key": conv(dt.keyType, cur_map and cur_map["key"]),
                    "value-id": (cur_map["value-id"] if cur_map
                                 else nid()),
                    "value": conv(dt.valueType,
                                  cur_map and cur_map["value"]),
                    "value-required": not dt.valueContainsNull}
        raise TypeError(f"no Iceberg mapping for {dt.simpleString()}")

    def field(f: T.StructField, curf: dict | None) -> dict:
        # parent id assigned before descending, per spec; reused when
        # the base schema has this name at this path
        fid = curf["id"] if curf is not None else nid()
        return {"id": fid, "name": f.name, "required": not f.nullable,
                "type": conv(f.dataType,
                             curf["type"] if curf is not None else None)}

    base_fields = ({f["name"]: f for f in base["fields"]}
                   if base is not None else {})
    out = {"type": "struct", "schema-id": 0,
           "fields": [field(f, base_fields.get(f.name))
                      for f in schema.fields]}
    max_reused = max(_all_ids(out), default=0)
    return out, max(counter["id"], max_reused)


def _all_ids(node) -> list[int]:
    out: list[int] = []
    if isinstance(node, dict):
        for k, v in node.items():
            if k in ("id", "element-id", "key-id", "value-id"):
                out.append(v)
            else:
                out.extend(_all_ids(v))
    elif isinstance(node, list):
        for x in node:
            out.extend(_all_ids(x))
    return out


def _bucket_bound(b: int) -> bytes:
    """Spec Appendix D single-value serialization for int: 4-byte
    little-endian — used for the manifest list's partition summaries."""
    return _struct.pack("<i", b)


class IcebergTable:
    """Hash-bucketed Iceberg v2 table (see module docstring). Same
    interface as `VersionedParquetTable` / `DeltaLogTable`:
    read / commit / last_epoch / current_version / bucket_expr."""

    def __init__(self, path: str, n_buckets: int = 16, retain: int = 2):
        self.path = path
        self.meta_dir = os.path.join(path, "metadata")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.meta_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)
        meta = self._current_metadata()
        self.n_buckets = (int(meta["properties"]["bucketing.count"])
                          if meta else n_buckets)
        self.retain = retain  # interface parity; history is logical
        self._snapshot_version: int | None = None
        self._pinned_file_version: int | None = None

    # -------------------------------------------------------- metadata

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.metadata.json")

    def _hint_version(self) -> int:
        """Latest committed version: version-hint.text, verified (and
        healed forward) against the metadata files actually present —
        the hint write is the non-atomic tail of the commit protocol."""
        hint = 0
        try:
            with open(os.path.join(self.meta_dir, "version-hint.text")) as f:
                hint = int(f.read().strip())
        except (OSError, ValueError):
            pass
        while os.path.exists(self._meta_path(hint + 1)):
            hint += 1  # a crashed writer landed metadata but no hint
        return hint

    def _current_metadata(self) -> dict | None:
        v = self._hint_version()
        if v == 0:
            return None
        with open(self._meta_path(v)) as f:
            return json.load(f)

    # -------------------------------------------------------- manifests

    def _read_manifest_list(self, rel: str) -> list[dict]:
        with open(os.path.join(self.path, rel), "rb") as f:
            _, entries = read_container(f.read())
        return entries

    def _read_manifest(self, rel: str) -> list[dict]:
        with open(os.path.join(self.path, rel), "rb") as f:
            _, entries = read_container(f.read())
        return entries

    @staticmethod
    def _manifest_key(rel_path: str) -> str | None:
        """Bucket key a manifest is pinned to, from the name
        convention: `{token}-b{N}.avro` → 'b{N}', `{token}-flat.avro`
        → 'flat', delete-only manifests → None (never carried
        forward)."""
        stem = os.path.basename(rel_path)[:-len(".avro")]
        tag = stem.rsplit("-", 1)[-1]
        if tag == "flat" or (tag[:1] == "b" and tag[1:].isdigit()):
            return tag
        return None

    def _write_manifest(self, name: str, entries: list[dict],
                        seq: int, sid: int,
                        spec_empty: bool = False) -> dict:
        """Write one manifest OCF and return its manifest_file row for
        the manifest list. `spec_empty` selects the strict empty r102
        partition record for tables whose spec declares no fields."""
        rel = os.path.join("metadata", name)
        raw = write_container(entries, _entry_schema(spec_empty),
                              metadata={"format-version": b"2",
                                        "content": b"data",
                                        "partition-spec-id": b"0"})
        with open(os.path.join(self.path, rel), "wb") as f:
            f.write(raw)
        live = [e for e in entries if e["status"] != ST_DELETED]
        dead = [e for e in entries if e["status"] == ST_DELETED]
        buckets = sorted({e["data_file"]["partition"].get(BUCKET_COL)
                          for e in live
                          if e["data_file"]["partition"].get(BUCKET_COL)
                          is not None})
        summary = None
        if buckets:
            summary = [{
                "contains_null": any(
                    e["data_file"]["partition"].get(BUCKET_COL)
                    is None for e in live),
                "contains_nan": False,
                "lower_bound": _bucket_bound(buckets[0]),
                "upper_bound": _bucket_bound(buckets[-1]),
            }]
        return {
            "manifest_path": rel,
            "manifest_length": len(raw),
            "partition_spec_id": 0,
            "content": 0,  # data
            "sequence_number": seq,
            "min_sequence_number": min(
                (e["sequence_number"] for e in entries
                 if e["sequence_number"] is not None), default=seq),
            "added_snapshot_id": sid,
            "added_files_count": len(live),
            "existing_files_count": 0,
            "deleted_files_count": len(dead),
            "added_rows_count": sum(
                e["data_file"]["record_count"] for e in live),
            "existing_rows_count": 0,
            "deleted_rows_count": sum(
                e["data_file"]["record_count"] for e in dead),
            "partitions": summary,
        }

    # --------------------------------------------------------- reading

    def current_version(self) -> int:
        """Commit count = the table's last sequence number. NOT the
        metadata FILE version (`_hint_version`): maintenance ops like
        `expire_snapshots` write metadata versions without commits, so
        the two counters diverge by design."""
        meta = self._current_metadata()
        return int(meta["last-sequence-number"]) if meta else 0

    def last_epoch(self) -> int | None:
        meta = self._current_metadata()
        if not meta or not meta.get("snapshots"):
            return None
        sid = meta["current-snapshot-id"]
        for s in meta["snapshots"]:
            if s["snapshot-id"] == sid:
                epoch = s["summary"].get("dss.epoch")
                return int(epoch) if epoch is not None else None
        return None

    def bucket_expr(self, key_cols: tuple[str, ...]):
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in key_cols]),
            F.lit(self.n_buckets)).cast("int")

    def data_path(self, version: int | None = None) -> str | None:
        return self.path if self.current_version() > 0 else None

    def _snapshot(self, meta: dict, version: int) -> dict:
        """Snapshot of the `version`-th commit (sequence numbers are
        the commit counter, stable across snapshot expiry)."""
        for s in meta["snapshots"]:
            if s["sequence-number"] == version:
                return s
        raise ValueError(
            f"snapshot for version {version} of {self.path} has been "
            f"expired (time travel below the retained window)")

    def _live_files(self, meta: dict, version: int,
                    buckets: list[int] | None = None) -> list[str]:
        """Live data files of the `version`-th snapshot; with
        `buckets`, manifests whose partition-summary bounds exclude
        every requested bucket are PRUNED — never opened, never read.
        That is the spec's manifest-level partition pruning and the
        100 TB point-read lever: a one-bucket read opens O(manifests
        covering that bucket), not O(all manifests)."""
        snap = self._snapshot(meta, version)
        rel_list = snap["manifest-list"]
        files: list[str] = []
        want = set(buckets) if buckets is not None else None
        for mf in self._read_manifest_list(rel_list):
            if want is not None and mf.get("partitions"):
                (summary,) = mf["partitions"]
                lo = _struct.unpack("<i", summary["lower_bound"])[0]
                hi = _struct.unpack("<i", summary["upper_bound"])[0]
                if not any(lo <= b <= hi for b in want):
                    continue  # pruned on summary bounds alone
            for e in self._read_manifest(mf["manifest_path"]):
                if want is not None and e["data_file"]["partition"].get(
                        BUCKET_COL) not in want:
                    continue
                if e["status"] != ST_DELETED:
                    files.append(e["data_file"]["file_path"])
        return files

    def read_schema(self, spark: SparkSession):
        """Stored schema from the CONTROL PLANE: the `dss.spark-schema`
        table property (exact Spark types — Iceberg's own schema maps
        byte/short to `int`, and the pinned bucket function needs the
        dtype the files actually carry). Tables written before the
        property existed fall back to the full read's schema. Returns
        None when nothing is committed."""
        from pyspark.sql import types as _T

        meta = self._current_metadata()
        if meta is None or self.current_version() == 0:
            return None
        raw = meta.get("properties", {}).get("dss.spark-schema")
        if raw:
            return _T.StructType.fromJson(json.loads(raw))
        full = self.read(spark)
        return full.schema if full is not None else None

    def read(self, spark: SparkSession, version: int | None = None,
             buckets: list[int] | None = None) -> DataFrame | None:
        """Current state, time travel via `version`, and (with
        `buckets`) a manifest-PRUNED point read — only manifests whose
        partition summaries cover a requested bucket are opened."""
        current = self.current_version()
        if version is None:
            self._snapshot_version = current  # transaction snapshot
            self._pinned_file_version = self._hint_version()
        elif version > current:
            raise ValueError(
                f"version {version} not committed for {self.path} "
                f"(current {current})")
        if version == 0 or current == 0:
            return None
        meta = self._current_metadata()
        files = self._live_files(meta, current if version is None
                                 else version, buckets=buckets)
        if not files:
            return None
        reader = spark.read.option("basePath", self.data_dir)
        if len(meta.get("schemas", [])) > 1:
            # evolved table: files span schema versions — merge footers
            # (only paid after an actual evolution, not on the hot path)
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    # -------------------------------------------------------- commits

    def commit(self, df: DataFrame, epoch_id: int,
               touched_buckets: list[int] | None = None,
               operation: str | None = None) -> int:
        """Stage `df`'s parquet under `data/`, write k new manifests
        (touched buckets only), a new manifest list, and metadata
        version V+1 via put-if-absent. O(touched) manifest writes +
        one O(n_buckets) list. `operation` overrides the snapshot
        summary operation (maintenance commits use "replace")."""
        import tempfile as _tempfile

        import pyarrow.parquet as _pq

        version = (self._snapshot_version
                   if self._snapshot_version is not None
                   else self.current_version())
        seq = version + 1
        sid = uuid.uuid5(uuid.NAMESPACE_URL,
                         f"dss-iceberg:{self.path}:{seq}").int % (2 ** 62)

        staging = _tempfile.mkdtemp(dir=self.path, prefix="_staging_")
        token = os.path.basename(staging).removeprefix("_staging_")
        if BUCKET_COL in df.columns:
            df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
        else:
            # unbucketed frame: `touched_buckets=None` (default) stays a
            # full rewrite; an EXPLICIT list (incl. []) is an append —
            # flat manifests carry key 'flat', which the b{N} doom set
            # below never contains, so prior data survives
            df.write.mode("overwrite").parquet(staging)

        # strict r102 form: a table whose partition SPEC declares no
        # fields writes the empty partition record (first commit: the
        # spec is about to be created from this df's columns)
        meta = self._current_metadata()
        if meta is not None:
            spec_empty = not meta["partition-specs"][0]["fields"]
        else:
            spec_empty = BUCKET_COL not in df.columns

        # move staged parquet into data/, building ADDED entries per
        # bucket key ('b{N}' for __bucket=N dirs, 'flat' otherwise)
        adds: dict[str, list[dict]] = {}
        staged: list[tuple[str, str, int | None]] = []
        for entry in sorted(os.listdir(staging)):
            full = os.path.join(staging, entry)
            if os.path.isdir(full) and entry.startswith(f"{BUCKET_COL}="):
                b = int(entry.split("=", 1)[1])
                for fname in sorted(os.listdir(full)):
                    if fname.endswith(".parquet") and not fname.startswith("."):
                        staged.append((os.path.join(full, fname), entry, b))
            elif (os.path.isfile(full) and entry.endswith(".parquet")
                  and not entry.startswith(".")):
                staged.append((full, "", None))
        for i, (src, rel_dir, b) in enumerate(staged):
            os.makedirs(os.path.join(self.data_dir, rel_dir), exist_ok=True)
            rel = os.path.join(rel_dir, f"part-{seq:05d}-{i:05d}-"
                                        f"{token}.parquet")
            dst = os.path.join(self.data_dir, rel)
            os.replace(src, dst)
            key = f"b{b}" if b is not None else "flat"
            adds.setdefault(key, []).append({
                "status": ST_ADDED, "snapshot_id": sid,
                "sequence_number": seq, "file_sequence_number": seq,
                "data_file": {
                    "content": 0, "file_path": dst,
                    "file_format": "PARQUET",
                    "partition": ({} if spec_empty else {BUCKET_COL: b}),
                    "record_count": _pq.read_metadata(dst).num_rows,
                    "file_size_in_bytes": os.stat(dst).st_size,
                }})
        shutil.rmtree(staging, ignore_errors=True)

        # prior manifests by bucket key — a key can hold SEVERAL live
        # manifests (append commits stack them); all are carried
        # forward by reference unless the bucket is being replaced
        prior: dict[str, list[dict]] = {}
        if meta is not None and version > 0:
            for mf in self._read_manifest_list(
                    self._snapshot(meta, version)["manifest-list"]):
                key = self._manifest_key(mf["manifest_path"])
                if key is not None:
                    prior.setdefault(key, []).append(mf)

        if touched_buckets is None:
            doomed = set(prior)
        else:
            doomed = {f"b{b}" for b in touched_buckets} & set(prior)

        list_entries: list[dict] = []
        for key in sorted(prior):
            if key not in doomed:
                # manifest reuse — untouched buckets stay live even
                # when this commit also APPENDS to them
                list_entries.extend(prior[key])

        for key in sorted(set(adds) | doomed):
            deleted: list[dict] = []
            if key in doomed:
                for mf in prior[key]:
                    for e in self._read_manifest(mf["manifest_path"]):
                        if e["status"] != ST_DELETED:
                            # deleted entries keep the file's original
                            # data sequence number (spec: sequence
                            # inheritance)
                            deleted.append({**e, "status": ST_DELETED})
            entries = deleted + adds.get(key, [])
            if not entries:
                continue
            name = (f"{token}-{key}.avro" if key in adds
                    else f"{token}-del{key}.avro")
            list_entries.append(
                self._write_manifest(name, entries, seq, sid,
                                     spec_empty=spec_empty))

        list_rel = os.path.join("metadata",
                                f"snap-{sid}-1-{token}.avro")
        with open(os.path.join(self.path, list_rel), "wb") as f:
            f.write(write_container(list_entries, MANIFEST_FILE_SCHEMA,
                                    metadata={"format-version": b"2"}))

        import time as _time

        now_ms = int(_time.time() * 1000)
        schema_json, last_col = iceberg_schema_of(df.schema)
        bucket_fid = next((f["id"] for f in schema_json["fields"]
                           if f["name"] == BUCKET_COL), None)
        snapshot = {
            "snapshot-id": sid,
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "manifest-list": list_rel,
            "schema-id": 0,
            "summary": {
                "operation": operation or (
                    "overwrite" if version > 0 else "append"),
                "dss.epoch": str(epoch_id),
            },
        }
        if meta is not None:
            snapshot["parent-snapshot-id"] = meta["current-snapshot-id"]
            new_meta = dict(meta)
            # schema drift (the CDC evolution path): id-stable evolve —
            # same-name fields keep their column ids, new fields draw
            # fresh ones past last-column-id, and the evolved schema is
            # APPENDED under a new schema-id (historic snapshots keep
            # pointing at theirs, per the spec)
            cur_schema = next(
                s for s in meta["schemas"]
                if s["schema-id"] == meta["current-schema-id"])
            evolved, evolved_last = iceberg_schema_of(
                df.schema, base=cur_schema,
                last_column_id=meta["last-column-id"])
            if strip_field_ids(evolved) == strip_field_ids(cur_schema):
                snapshot["schema-id"] = meta["current-schema-id"]
            else:
                new_id = max(s["schema-id"] for s in meta["schemas"]) + 1
                evolved["schema-id"] = new_id
                new_meta["schemas"] = list(meta["schemas"]) + [evolved]
                new_meta["current-schema-id"] = new_id
                new_meta["last-column-id"] = max(
                    meta["last-column-id"], evolved_last)
                snapshot["schema-id"] = new_id
                # keep the EXACT Spark schema current alongside the
                # Iceberg one (see read_schema: Iceberg's `int`
                # erases Spark's byte/short, and key dtypes must
                # round-trip exactly for the pinned bucket function)
                new_meta["properties"] = {
                    **meta.get("properties", {}),
                    "dss.spark-schema": df.schema.json()}
        else:
            spec_fields = []
            if bucket_fid is not None:
                spec_fields = [{"name": BUCKET_COL,
                                "transform": "identity",
                                "source-id": bucket_fid,
                                "field-id": 1000}]
            new_meta = {
                "format-version": 2,
                "table-uuid": str(uuid.uuid5(
                    uuid.NAMESPACE_URL, "dss-iceberg:" + self.path)),
                "location": self.path,
                "last-column-id": last_col,
                "current-schema-id": 0,
                "schemas": [schema_json],
                "default-spec-id": 0,
                "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
                "last-partition-id": 1000 if spec_fields else 999,
                "default-sort-order-id": 0,
                "sort-orders": [{"order-id": 0, "fields": []}],
                "properties": {
                    "bucketing.count": str(self.n_buckets),
                    "write.format.default": "parquet",
                    # exact Spark schema (the Iceberg schema's `int`
                    # erases byte/short): control-plane source for
                    # read_schema / key-dtype pinning
                    "dss.spark-schema": df.schema.json(),
                },
                "snapshots": [],
                "snapshot-log": [],
                "metadata-log": [],
            }
        new_meta["last-sequence-number"] = seq
        new_meta["last-updated-ms"] = now_ms
        new_meta["current-snapshot-id"] = sid
        new_meta["snapshots"] = list(new_meta.get("snapshots", [])) + [snapshot]
        new_meta["snapshot-log"] = list(new_meta.get("snapshot-log", [])) + [
            {"timestamp-ms": now_ms, "snapshot-id": sid}]
        # metadata FILE version: decoupled from the commit count —
        # expiry and other maintenance write metadata-only versions
        prev_file = (self._pinned_file_version
                     if self._pinned_file_version is not None
                     else self._hint_version())
        file_version = prev_file + 1
        if prev_file > 0:
            # spec property write.metadata.previous-versions-max
            # (default 100): the metadata-log is a ring, not a ledger —
            # unbounded growth would make every commit's metadata JSON
            # O(history) at micro-batch cadence
            keep = int(new_meta.get("properties", {}).get(
                "write.metadata.previous-versions-max", 100))
            new_meta["metadata-log"] = (list(
                new_meta.get("metadata-log", [])) + [
                {"timestamp-ms": now_ms,
                 "metadata-file": self._meta_path(prev_file)}])[-keep:]

        # put-if-absent: HadoopTableOperations' optimistic-concurrency
        # primitive — a concurrent writer to the same version loses here
        with open(self._meta_path(file_version), "x") as f:
            json.dump(new_meta, f, separators=(",", ":"))
        hint = os.path.join(self.meta_dir, "version-hint.text")
        with open(hint + ".tmp", "w") as f:
            f.write(str(file_version))
        os.replace(hint + ".tmp", hint)
        self._snapshot_version = seq
        self._pinned_file_version = file_version
        return seq

    # ----------------------------------------------------- maintenance

    def live_file_counts(self, buckets: list[int] | None = None
                         ) -> dict[int, int]:
        """Live data files per bucket (restricted to `buckets` when
        given) — the auto-maintenance policy's trigger input. Uses the
        same manifest-level partition-summary pruning as the point
        read: manifests excluding every requested bucket are never
        opened."""
        current = self.current_version()
        if current == 0:
            return {}
        meta = self._current_metadata()
        out: dict[int, int] = {}
        for path in self._live_files(meta, current, buckets=buckets):
            rel = os.path.relpath(path, self.data_dir)
            head = rel.split(os.sep, 1)[0]
            if head.startswith(f"{BUCKET_COL}="):
                b = int(head.split("=", 1)[1])
                out[b] = out.get(b, 0) + 1
        return out

    def compact(self, spark: SparkSession,
                buckets: list[int] | None = None) -> int:
        """The spec's `rewriteDataFiles` (bin-packing compaction):
        rewrite each selected bucket's accumulated small files —
        append commits stack one file per epoch — into one file per
        bucket, as a `replace` snapshot with NO logical data change
        (`dss.epoch` is preserved, so epoch-idempotent replay is
        unaffected). At 100 TB this is THE maintenance lever: scan
        cost is per-file overhead × file count, and a year of
        micro-batches otherwise leaves thousands of files per bucket.
        Returns the new commit version, or 0 when the table is empty.
        """
        # control-plane preflight (schema + default bucket list from
        # the metadata/manifests): building the FULL read here cost
        # O(live files) at every PARTIAL compaction — measured as the
        # compact probe's wall growing with history depth in
        # tools/scaling_lake.py
        schema = self.read_schema(spark)
        if schema is None:
            return 0
        if BUCKET_COL not in schema.fieldNames():
            # flat (unbucketed) table — mirror the Delta twin: one
            # output file, full rewrite
            cur = self.read(spark)
            if cur is None:
                return 0
            return self.commit(cur.coalesce(1),
                               epoch_id=self.last_epoch() or 0,
                               touched_buckets=None,
                               operation="replace")
        if buckets is None:
            buckets = sorted(self.live_file_counts())
        if not buckets:
            return 0
        # pruned read: a partial compaction opens only the manifests
        # covering its buckets (and pins the transaction snapshot)
        pruned = self.read(spark, buckets=list(buckets))
        if pruned is None:  # requested buckets hold no files
            return 0
        sub = pruned.repartition(len(buckets), F.col(BUCKET_COL))
        return self.commit(sub, epoch_id=self.last_epoch() or 0,
                           touched_buckets=list(buckets),
                           operation="replace")

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """The spec's `expireSnapshots` maintenance op: drop all but
        the newest `keep_last` snapshots from the table metadata (a new
        metadata version — the data files they exclusively referenced
        become orphans for `vacuum()` to collect after retention).
        Time travel below the retained window raises afterwards, by
        design. Returns the expired snapshot ids."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        meta = self._current_metadata()
        if meta is None:
            return []
        snaps = sorted(meta["snapshots"],
                       key=lambda s: s["sequence-number"])
        expired = snaps[:-keep_last]
        if not expired:
            return []
        keep = snaps[-keep_last:]
        keep_ids = {s["snapshot-id"] for s in keep}
        file_version = self._hint_version() + 1
        new_meta = dict(meta)
        new_meta["snapshots"] = keep
        new_meta["snapshot-log"] = [
            e for e in meta.get("snapshot-log", [])
            if e["snapshot-id"] in keep_ids]
        import time as _time

        new_meta["last-updated-ms"] = int(_time.time() * 1000)
        with open(self._meta_path(file_version), "x") as f:
            json.dump(new_meta, f, separators=(",", ":"))
        hint = os.path.join(self.meta_dir, "version-hint.text")
        with open(hint + ".tmp", "w") as f:
            f.write(str(file_version))
        os.replace(hint + ".tmp", hint)
        self._snapshot_version = None
        self._pinned_file_version = None
        return [s["snapshot-id"] for s in expired]

    def vacuum(self, retention_seconds: float = 7 * 86400) -> list[str]:
        """Delete files referenced by NO retained snapshot and older
        than `retention_seconds` — the `remove_orphan_files` action,
        over BOTH planes:

        - data/: parquet orphaned by losing writers or snapshot expiry;
        - metadata/: manifest lists and manifests reachable from no
          retained snapshot (superseded by later commits or expired),
          and `v*.metadata.json` versions below the current one that
          fell out of the metadata-log ring.

        Without the metadata sweep, micro-batch cadence grows
        metadata/ without bound (one manifest list + k manifests per
        epoch). Files referenced by any retained snapshot or the
        metadata log are never touched."""
        import time as _time

        meta = self._current_metadata()
        referenced: set[str] = set()
        meta_referenced: set[str] = set()  # absolute paths under path/
        if meta:
            for snap in meta["snapshots"]:  # retained snapshots only
                meta_referenced.add(
                    os.path.join(self.path, snap["manifest-list"]))
                for mf in self._read_manifest_list(snap["manifest-list"]):
                    meta_referenced.add(
                        os.path.join(self.path, mf["manifest_path"]))
                    for e in self._read_manifest(mf["manifest_path"]):
                        # a DELETED entry is bookkeeping, not a live
                        # reference: the file is reachable only where
                        # some retained snapshot lists it live
                        if e["status"] != ST_DELETED:
                            referenced.add(e["data_file"]["file_path"])
            # metadata-log ring + the current version stay readable
            # (time travel across metadata versions)
            for entry in meta.get("metadata-log", []):
                meta_referenced.add(entry["metadata-file"])
        meta_referenced.add(self._meta_path(self._hint_version()))
        cutoff = _time.time() - retention_seconds
        deleted: list[str] = []
        for dirpath, _dirs, files in os.walk(self.data_dir):
            for fname in files:
                full = os.path.join(dirpath, fname)
                if (full not in referenced
                        and os.stat(full).st_mtime < cutoff):
                    os.remove(full)
                    deleted.append(full)
        for fname in os.listdir(self.meta_dir):
            full = os.path.join(self.meta_dir, fname)
            collectable = (
                fname.endswith(".avro")  # manifest / manifest list
                or (fname.startswith("v")
                    and fname.endswith(".metadata.json")))
            if (collectable and full not in meta_referenced
                    and os.stat(full).st_mtime < cutoff):
                os.remove(full)
                deleted.append(full)
        return deleted
