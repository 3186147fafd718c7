"""Config-driven pipeline assembly: properties in, running pipeline out.

This is the reference's operating model — Debezium Server is configured
entirely through `debezium.*` properties and assembled at boot
(DebeziumConfiguration.java:24-43 requires `debezium.sink.type`; the SMT
chain/predicates come from `debezium.transforms*`/`debezium.predicates*`,
DebeziumServerConfigSourceFactory.java:107-117; the sink is resolved by
name, ChangeConsumerProducer.java:61-90).

Property surface understood here (the Spark-native subset):

    debezium.source.type              changelog-dir | lines | debezium-changelog |
                                      pgoutput-wal | oplog-bson | mysql-binlog |
                                      sqlserver-cdc | oracle-logminer |
                                      db2-cdc
    debezium.source.db2.destination   db2-cdc only: the envelope
                                      destination for the ASN CD-table
                                      export at debezium.source.path
                                      (single-'U'-row registration
                                      semantics, CHG_UPD_TO_DEL_INS='N'
                                      — D+I update-pair exports need
                                      the batch decode; see
                                      sources/db2_cdc_source.py);
                                      unknown-operation rows follow
                                      the dead-letter setting below
    debezium.source.logminer.prefix   oracle-logminer only: destination
                                      prefix — envelope rows land at
                                      {prefix}.{SEG_OWNER}.{TABLE_NAME}
                                      (the Debezium topic convention);
                                      debezium.source.path holds the
                                      V$LOGMNR_CONTENTS poll export
                                      (see sources/logminer_source.py);
                                      CSF continuation rows surface as
                                      error rows and follow the
                                      dead-letter setting below
    debezium.source.sqlserver.destination
                                      sqlserver-cdc only: the envelope
                                      destination for the change-table
                                      export at debezium.source.path
                                      (one capture instance per path,
                                      row_filter='all' semantics — see
                                      sources/sqlserver_cdc_source.py)
    debezium.source.path              directory for the file source
    debezium.source.max.files.per.trigger   backpressure knob
    debezium.source.binlog.names      JSON {"schema.table": [column
                                      names]} (mysql-binlog only — the
                                      schema-history input; names are
                                      not on the binlog wire)
    debezium.source.binlog.checksum   none (default) | crc32 — set to
                                      crc32 for captures from a
                                      binlog_checksum=CRC32 server
    debezium.source.dead.letter.destination
                                      wire sources only: route rows the
                                      decoder quarantined (malformed
                                      bytes, relation/TABLE_MAP OIDs
                                      not in the startup registry) to
                                      this destination instead of
                                      dropping them; value is a JSON
                                      {error, lsn} document. Unset =
                                      drop (the pre-r6 behavior).
                                      RESTRICTION: wire-source
                                      registries (pgoutput Relations,
                                      binlog TABLE_MAPs) are frozen at
                                      stream start from a batch
                                      pre-read of the directory —
                                      tables first declared in files
                                      that arrive AFTER start
                                      dead-letter (or drop) until
                                      restart. Size the pre-read
                                      accordingly or restart on DDL.
    debezium.transforms               ordered list: t1,t2
    debezium.transforms.<n>.type      hoist_field | insert_header |
                                      insert_field | mask_field | filter |
                                      route_rename | content_based_router
    debezium.transforms.<n>.<opt>     per-type options
    debezium.transforms.<n>.predicate SQL boolean gating the transform
    debezium.format.value             json | jsonbytearray | binary |
                                      simplestring | cloudevents | avro |
                                      protobuf | connect (default)
    debezium.format.value.schema.id   Confluent wire-frame id (avro/protobuf)
    debezium.sink.type                any registered sink name
    debezium.sink.<type>.<opt>        sink options (prefix-subset view)
    debezium.sink.parquet-upsert.table.format
                                      versioned (default) | delta |
                                      iceberg — storage layer of the
                                      PK materialization
    debezium.sink.parquet-upsert.maintenance.compact.files.per.bucket
                                      auto-maintenance: partial-compact
                                      any TOUCHED bucket whose live-file
                                      count exceeds N after a merge
                                      (probe is O(touched buckets))
    debezium.sink.parquet-upsert.maintenance.expire.every.epochs
    debezium.sink.parquet-upsert.maintenance.expire.condition
                                      run expire_where(condition) on
                                      every Kth epoch (TTL pass)
    debezium.sink.parquet-upsert.maintenance.vacuum.every.epochs
    debezium.sink.parquet-upsert.maintenance.vacuum.retention.seconds
    debezium.sink.parquet-upsert.maintenance.keep.snapshots
                                      physical cleanup cadence for the
                                      lake layers (iceberg: expire
                                      snapshots then vacuum; delta:
                                      vacuum); retention 0 is the
                                      embedded single-writer default
                                      (see sinks/parquet_sink.py
                                      MaintenancePolicy)
    debezium.signal.dir               optional SignalChannel directory

Schemas are Python-side arguments (StructTypes are not strings); all else
is declarative config, matching `config/application.properties` usage.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from debezium_server_spark.config import PipelineConfig
from debezium_server_spark.operators import transforms as tx
from debezium_server_spark.sinks import get_sink
from debezium_server_spark.sources.file_source import changelog_stream, lines_stream
from debezium_server_spark.streaming.pipeline import Pipeline
from debezium_server_spark.streaming.signals import SignalChannel

_TRANSFORM_BUILDERS = {
    "hoist_field": lambda o: tx.hoist_field(o["field"]),
    "insert_header": lambda o: tx.insert_header(o["header"], o["value"]),
    "insert_field": lambda o: tx.insert_field(o["field"], F.expr(o["value.expr"])),
    "mask_field": lambda o: tx.mask_field(o["field"], mask=o.get("mask", "****")),
    "route_rename": lambda o: tx.rename_destination(o["pattern"], o["replacement"]),
    "content_based_router": lambda o: tx.content_based_router(
        o["when"], o["destination"]
    ),
    "filter": lambda o: tx.FilterTransform(o["condition"]),
    "timestamp_router": lambda o: tx.timestamp_router(
        topic_format=o.get("topic.format", "${topic}-${timestamp}"),
        timestamp_format=o.get("timestamp.format", "yyyyMMdd"),
    ),
}


def build_transform_chain(cfg: PipelineConfig) -> tx.Chain:
    """`debezium.transforms=a,b` + per-name type/options → ordered Chain
    (predicate-gated where `.predicate` is configured)."""
    names = [n.strip() for n in (cfg.get("debezium.transforms") or "").split(",") if n.strip()]
    chain = []
    for n in names:
        opts = cfg.subset(f"debezium.transforms.{n}")
        ttype = opts.pop("type", None)
        if ttype not in _TRANSFORM_BUILDERS:
            raise ValueError(
                f"transform {n!r}: unknown type {ttype!r}; one of {sorted(_TRANSFORM_BUILDERS)}"
            )
        predicate = opts.pop("predicate", None)
        t = _TRANSFORM_BUILDERS[ttype](opts)
        if predicate is not None:
            if isinstance(t, tx.FilterTransform):
                # gated filter: rows failing the predicate pass untouched
                t = tx.FilterTransform(f"(NOT ({predicate})) OR ({t.condition})", t.name)
            else:
                t.predicate = lambda df, _p=predicate: F.expr(_p)
        chain.append(t)
    return tx.Chain(chain)


def build_source(
    spark: SparkSession,
    cfg: PipelineConfig,
    row_schema: T.StructType | None = None,
    key_schema: T.StructType | None = None,
):
    stype = cfg.get("debezium.source.type", "changelog-dir")
    path = cfg.require("debezium.source.path")
    if stype == "changelog-dir":
        if row_schema is None or key_schema is None:
            raise ValueError("changelog-dir source needs row_schema and key_schema")
        mft = cfg.get("debezium.source.max.files.per.trigger")
        return changelog_stream(
            spark, path, row_schema, key_schema,
            max_files_per_trigger=int(mft) if mft else None,
        )
    if stype == "lines":
        return lines_stream(
            spark, path, destination=cfg.get("debezium.source.destination", "topicX")
        )
    if stype == "debezium-changelog":
        # the registered Python DataSource: raw BatchEvent rows, key and
        # value stay JSON text for per-destination typing downstream
        from debezium_server_spark.sources.python_datasource import (
            register_changelog_source,
        )

        register_changelog_source(spark)
        return spark.readStream.format("debezium-changelog").option("path", path).load()
    if stype in ("pgoutput-wal", "oplog-bson", "mysql-binlog"):
        return _build_wire_source(spark, cfg, stype, path)
    if stype == "sqlserver-cdc":
        # change-table tail (cdc.fn_cdc_get_all_changes_* exports as
        # parquet): row_filter='all' rows decode STATELESSLY, so the
        # stream is a plain projection; the schema comes from a
        # bounded batch pre-read of the same export directory
        from debezium_server_spark.sources.sqlserver_cdc_source import (
            decode_cdc_changes_stateless,
        )

        dest = cfg.require("debezium.source.sqlserver.destination")
        batch_schema = spark.read.parquet(path).schema
        reader = spark.readStream.schema(batch_schema)
        mft = cfg.get("debezium.source.max.files.per.trigger")
        if mft:
            reader = reader.option("maxFilesPerTrigger", int(mft))
        env = decode_cdc_changes_stateless(reader.parquet(path),
                                           destination=dest)
        return env.select(
            F.col("destination"),
            F.lit(None).cast("string").alias("key"),
            F.to_json(F.struct(
                F.col("op"), F.col("before"), F.col("after"),
                F.struct(F.col("lsn"), F.col("seqval")).alias("source"),
            )).alias("value"))
    if stype == "oracle-logminer":
        # V$LOGMNR_CONTENTS poll exports as parquet: complete rows
        # decode STATELESSLY (redo-SQL parse per row); CSF
        # continuation rows surface as error rows and ride the same
        # dead-letter routing as the wire sources
        from debezium_server_spark.sources.logminer_source import (
            decode_logminer_changes_stateless,
        )

        prefix = cfg.require("debezium.source.logminer.prefix")
        batch_schema = spark.read.parquet(path).schema
        reader = spark.readStream.schema(batch_schema)
        mft = cfg.get("debezium.source.max.files.per.trigger")
        if mft:
            reader = reader.option("maxFilesPerTrigger", int(mft))
        env = decode_logminer_changes_stateless(reader.parquet(path),
                                                prefix)
        good = (env.filter(F.col("error").isNull())
                .select(F.col("destination"),
                        F.lit(None).cast("string").alias("key"),
                        F.to_json(F.struct(
                            F.col("op"), F.col("before"), F.col("after"),
                            F.struct(F.col("scn"), F.col("row_id"))
                            .alias("source"),
                            F.col("xid"))).alias("value")))
        dlq_dest = cfg.get("debezium.source.dead.letter.destination")
        if not dlq_dest:
            return good
        dead = (env.filter(F.col("error").isNotNull())
                .select(F.lit(dlq_dest).alias("destination"),
                        F.lit(None).cast("string").alias("key"),
                        F.to_json(F.struct(
                            F.col("error"),
                            F.col("scn").alias("lsn"))).alias("value")))
        return good.unionByName(dead)
    if stype == "db2-cdc":
        # ASN CD-table poll exports as parquet: single-'U'-row
        # registrations decode STATELESSLY (plain projection);
        # unknown IBMSNAP_OPERATION rows surface as error rows and
        # ride the same dead-letter routing as the wire sources
        from debezium_server_spark.sources.db2_cdc_source import (
            decode_db2_cdc_changes_stateless,
        )

        dest = cfg.require("debezium.source.db2.destination")
        batch_schema = spark.read.parquet(path).schema
        reader = spark.readStream.schema(batch_schema)
        mft = cfg.get("debezium.source.max.files.per.trigger")
        if mft:
            reader = reader.option("maxFilesPerTrigger", int(mft))
        env = decode_db2_cdc_changes_stateless(reader.parquet(path),
                                               destination=dest)
        good = (env.filter(F.col("error").isNull())
                .select(F.col("destination"),
                        F.lit(None).cast("string").alias("key"),
                        F.to_json(F.struct(
                            F.col("op"), F.col("before"), F.col("after"),
                            F.struct(F.col("lsn"), F.col("seqval"))
                            .alias("source"))).alias("value")))
        dlq_dest = cfg.get("debezium.source.dead.letter.destination")
        if not dlq_dest:
            return good
        dead = (env.filter(F.col("error").isNotNull())
                .select(F.lit(dlq_dest).alias("destination"),
                        F.lit(None).cast("string").alias("key"),
                        F.to_json(F.struct(
                            F.col("error"),
                            F.col("lsn"))).alias("value")))
        return good.unionByName(dead)
    raise ValueError(f"unknown source type {stype!r}")


def _build_wire_source(spark: SparkSession, cfg: PipelineConfig,
                       stype: str, path: str):
    """Real-CDC wire formats as config-selectable sources: a directory
    of `(seq bigint, data binary)` parquet (raw WAL messages / oplog
    BSON / framed binlog events) streams through the matching decoder
    into the RAW envelope shape (`raw_changelog_stream` convention:
    key/value stay JSON text, per-destination typing happens
    downstream). Registries that need cross-message state (pgoutput
    Relations, binlog TABLE_MAPs) come from a bounded BATCH pre-read
    of the same directory — a stream cannot collect."""
    import json as _json

    schema = "seq long, data binary"
    reader = spark.readStream.schema(schema)
    mft = cfg.get("debezium.source.max.files.per.trigger")
    if mft:
        reader = reader.option("maxFilesPerTrigger", int(mft))
    stream = reader.parquet(path)

    if stype == "pgoutput-wal":
        from debezium_server_spark.sources.pgoutput_source import (
            attach_transactions,
            decode_data_messages,
            extract_begins,
            load_relation_registry,
        )

        batch = spark.read.schema(schema).parquet(path)
        registry = load_relation_registry(batch)
        # transaction association (xid, commit ts_ms) joins the decoded
        # stream against the Begin frame from the same batch pre-read —
        # a stream-batch band join, so pgoutput ships the same ts_ms
        # contract as the oplog/binlog siblings
        env = attach_transactions(decode_data_messages(stream, registry),
                                  extract_begins(batch))
    elif stype == "oplog-bson":
        from debezium_server_spark.sources.oplog_source import (
            decode_oplog_changelog,
        )

        env = decode_oplog_changelog(stream)
    else:  # mysql-binlog
        from debezium_server_spark.sources.binlog_source import (
            decode_binlog_changelog,
            load_table_registry,
        )

        names = _json.loads(cfg.require("debezium.source.binlog.names"))
        checksum = (cfg.get("debezium.source.binlog.checksum", "none")
                    .lower() == "crc32")
        registry = load_table_registry(
            spark.read.schema(schema).parquet(path), checksum=checksum)
        env = decode_binlog_changelog(stream, names, registry=registry,
                                      checksum=checksum)

    # raw envelope: images stay JSON text inside the value document
    # (the multi-table convention). Quarantined rows (error != null —
    # malformed bytes, or an OID missing from the STARTUP-FROZEN
    # registry, e.g. a table first declared after stream start) either
    # drop (default) or, with debezium.source.dead.letter.destination
    # set, route as {error, lsn} rows to that destination so the sink
    # persists them — a long-running pipeline must not silently lose
    # rows on schema change (ADVICE r5, medium).
    payload = [F.col("op"), F.col("before"), F.col("after"),
               F.struct(F.col("seq").alias("lsn")).alias("source")]
    # oplog diff updates carry patch; pgoutput adds the transaction id
    for extra in ("patch", "xid", "ts_ms"):
        if extra in env.columns:
            payload.append(F.col(extra))
    good = (env.filter(F.col("error").isNull())
            .select(F.col("destination"),
                    F.lit(None).cast("string").alias("key"),
                    F.to_json(F.struct(*payload)).alias("value")))
    dlq_dest = cfg.get("debezium.source.dead.letter.destination")
    if not dlq_dest:
        return good
    dead = (env.filter(F.col("error").isNotNull())
            .select(F.lit(dlq_dest).alias("destination"),
                    F.lit(None).cast("string").alias("key"),
                    F.to_json(F.struct(
                        F.col("error"),
                        F.col("seq").alias("lsn"))).alias("value")))
    return good.unionByName(dead)


def build_pipeline(
    spark: SparkSession,
    props: dict[str, str],
    row_schema: T.StructType | None = None,
    key_schema: T.StructType | None = None,
):
    """Assemble (pipeline, sink, signal_channel) from properties — the
    `Main.main` analog. Start it with:

        pipeline, sink, signals = build_pipeline(spark, props, rs, ks)
        q = pipeline.start(sink, checkpoint_location=...,
                           signal_channel=signals)
    """
    cfg = PipelineConfig(props).with_storage_defaults()
    sink_type = cfg.require("debezium.sink.type")  # boot fails without it
    source = build_source(spark, cfg, row_schema, key_schema)
    chain = build_transform_chain(cfg)
    pipeline = Pipeline(source).transform(chain)
    fmt = cfg.get("debezium.format.value")
    if fmt and fmt != "connect":
        # DebeziumSerializationProducer dispatch: the serialization format
        # is the LAST stage before the sink; schema ids come from config
        # where the reference would negotiate them with a registry
        from debezium_server_spark.operators.serialization import serialize

        kwargs = {}
        sid = cfg.get("debezium.format.value.schema.id")
        if sid and fmt in ("avro", "protobuf"):
            kwargs["schema_id"] = int(sid)
        pipeline = pipeline.transform(lambda df: serialize(df, fmt, **kwargs))
    sink = get_sink(sink_type, **_pythonize(cfg.subset(f"debezium.sink.{sink_type}")))
    signal_dir = cfg.get("debezium.signal.dir")
    signals = SignalChannel(signal_dir) if signal_dir else None
    return pipeline, sink, signals


def _pythonize(opts: dict[str, str]) -> dict:
    """Sink kwargs arrive as dotted properties; underscore them and split
    comma-lists (key_fields etc.) so they match constructor signatures."""
    out = {}
    for k, v in opts.items():
        key = k.replace(".", "_")
        out[key] = tuple(v.split(",")) if key in ("key_fields",) else v
    return out
