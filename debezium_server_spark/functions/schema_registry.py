"""File-backed schema registry with drift-driven refresh.

Reference surface: the serializers are registry-backed
(DebeziumProperties.java:49-53 — Apicurio/Confluent; exercised by
DebeziumServerWithApicurioIT.java): each subject (destination) owns a
growing list of schema versions, every version gets a globally-unique
id, and the id rides each message's wire framing so consumers can fetch
the right schema.

Spark-first reshaping:
- the registry is a directory of immutable JSON docs (one per version,
  atomic os.replace publish) — the same storage discipline as the
  repo's manifests; swap the file I/O for an Apicurio/Confluent HTTP
  client on a real deployment, the interface is the registry API subset
  both expose (register idempotent-by-content, latest, get-by-id),
- `register` composes with functions/avro_codec.encode(schema_id=...)
  which already implements the Confluent wire frame (magic 0 +
  big-endian id),
- `RegistryTypedSink` is the from_json refresh loop: every epoch parses
  raw JSON values with the subject's latest registered schema; a batch
  whose keys drift past that schema triggers inference + registration
  of an evolved version, so an upstream ADD COLUMN flows through
  registry → parse → sink WITHOUT a stream restart. The drift check is
  one distinct-keys aggregation (tiny: |distinct JSON keys|); the
  expensive full inference runs only on drifted epochs.

Evolution policy: existing fields keep their registered types (backward
compatible — a type-changing upstream needs an explicit new subject);
new fields append with their inferred types.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class RegisteredSchema:
    id: int
    subject: str
    version: int
    schema: str  # schema document (Spark StructType JSON or Avro JSON)
    schema_type: str = "spark-struct"

    def struct(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema))


class FileSchemaRegistry:
    """Single-writer (driver-side) registry; readers are executors/tools.

    Layout: `<root>/<subject>/<version>.json`, docs carry their global
    id. Ids are assigned monotonically across subjects.
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- internals ---------------------------------------------------------
    def _docs(self) -> list[RegisteredSchema]:
        out = []
        for subject in sorted(os.listdir(self.root)):
            sdir = os.path.join(self.root, subject)
            if not os.path.isdir(sdir):
                continue
            for name in sorted(os.listdir(sdir)):
                if not name.endswith(".json"):
                    continue
                with open(os.path.join(sdir, name)) as f:
                    out.append(RegisteredSchema(**json.load(f)))
        return out

    # -- registry API subset ----------------------------------------------
    def register(self, subject: str, schema: str,
                 schema_type: str = "spark-struct") -> RegisteredSchema:
        """Idempotent by content: re-registering a subject's existing
        schema returns the already-assigned version/id."""
        existing = self.versions(subject)
        for doc in existing:
            if doc.schema == schema and doc.schema_type == schema_type:
                return doc
        all_docs = self._docs()
        doc = RegisteredSchema(
            id=max((d.id for d in all_docs), default=0) + 1,
            subject=subject,
            version=max((d.version for d in existing), default=0) + 1,
            schema=schema,
            schema_type=schema_type,
        )
        sdir = os.path.join(self.root, subject)
        os.makedirs(sdir, exist_ok=True)
        final = os.path.join(sdir, f"{doc.version:06d}.json")
        tmp = f"{final}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(doc.__dict__, f)
        os.replace(tmp, final)
        return doc

    def versions(self, subject: str) -> list[RegisteredSchema]:
        return [d for d in self._docs() if d.subject == subject]

    def latest(self, subject: str) -> RegisteredSchema | None:
        docs = self.versions(subject)
        return max(docs, key=lambda d: d.version) if docs else None

    def get_by_id(self, schema_id: int) -> RegisteredSchema | None:
        for d in self._docs():
            if d.id == schema_id:
                return d
        return None


def merge_struct(old: T.StructType, new: T.StructType) -> T.StructType:
    """Backward-compatible merge: old fields keep their types, fields
    only present in `new` append with their inferred types."""
    fields = list(old.fields)
    known = {f.name for f in fields}
    fields.extend(f for f in new.fields if f.name not in known)
    return T.StructType(fields)


class RegistryTypedSink:
    """Wrap a typed sink: per epoch, parse `value_col` (raw JSON text)
    with the subject's latest registered schema, auto-registering an
    evolved schema when the batch's JSON keys drift past it.

    The parsed struct lands in `out_col`; the inner sink sees a typed
    frame whose schema follows upstream DDL without a restart.
    """

    def __init__(self, inner, registry: FileSchemaRegistry, subject: str,
                 value_col: str = "value_raw", out_col: str = "value"):
        self.inner = inner
        self.registry = registry
        self.subject = subject
        self.value_col = value_col
        self.out_col = out_col
        self.name = getattr(inner, "name", type(inner).__name__)

    def _batch_keys(self, df: DataFrame) -> set[str]:
        rows = (
            df.select(
                F.explode(F.json_object_keys(F.col(self.value_col))).alias("k")
            )
            .distinct()
            .collect()
        )
        return {r["k"] for r in rows}

    def _infer(self, df: DataFrame) -> T.StructType:
        # Full inference — only reached on drifted epochs (cost bounded
        # by the drifted batch, never the steady-state path).
        spark = df.sparkSession
        inferred = spark.read.json(
            df.select(self.value_col).rdd.map(lambda r: r[0] or "{}")
        )
        return inferred.schema

    def resolve_schema(self, df: DataFrame) -> RegisteredSchema:
        latest = self.registry.latest(self.subject)
        known = set(latest.struct().fieldNames()) if latest else set()
        batch_keys = self._batch_keys(df)
        if latest is not None and batch_keys <= known:
            return latest
        inferred = self._infer(df)
        merged = (
            merge_struct(latest.struct(), inferred) if latest else inferred
        )
        return self.registry.register(
            self.subject, json.dumps(merged.jsonValue())
        )

    def __call__(self, df: DataFrame, epoch_id: int) -> None:
        doc = self.resolve_schema(df)
        typed = df.withColumn(
            self.out_col, F.from_json(F.col(self.value_col), doc.struct())
        ).withColumn("__schema_id", F.lit(doc.id))
        self.inner(typed, epoch_id)


# ---------------------------------------------------------------------------
# Compatibility checking (Confluent/Apicurio compatibility-level parity)
# ---------------------------------------------------------------------------

class IncompatibleSchemaError(ValueError):
    """Raised when a registration would violate the subject's
    compatibility level (the registry-side 409 in Confluent/Apicurio)."""


#: Widening chains a reader may apply to a writer's value (the Avro
#: promotion rules mapped onto Spark types): reader type must appear at
#: or after the writer type in its chain.
_PROMOTIONS: dict[str, tuple[str, ...]] = {
    "tinyint": ("tinyint", "smallint", "int", "bigint", "float", "double"),
    "smallint": ("smallint", "int", "bigint", "float", "double"),
    "int": ("int", "bigint", "float", "double"),
    "bigint": ("bigint", "float", "double"),
    "float": ("float", "double"),
    "string": ("string", "binary"),
    "binary": ("binary", "string"),
}


def _can_read(writer: T.DataType, reader: T.DataType) -> bool:
    """Can data written with `writer`'s type be read as `reader`'s type?
    Equal types, widening promotions, and recursive struct/array/map
    compatibility (new nullable struct fields get null defaults)."""
    if writer == reader:
        return True
    ws, rs = writer.simpleString(), reader.simpleString()
    if ws in _PROMOTIONS and rs in _PROMOTIONS.get(ws, ()):
        return True
    if isinstance(writer, T.StructType) and isinstance(reader, T.StructType):
        wf = {f.name: f for f in writer.fields}
        for rf in reader.fields:
            if rf.name in wf:
                if not _can_read(wf[rf.name].dataType, rf.dataType):
                    return False
            elif not rf.nullable:
                return False  # reader requires a field the writer never wrote
        return True  # writer-only fields are ignored by the reader
    if isinstance(writer, T.ArrayType) and isinstance(reader, T.ArrayType):
        return _can_read(writer.elementType, reader.elementType)
    if isinstance(writer, T.MapType) and isinstance(reader, T.MapType):
        return _can_read(writer.keyType, reader.keyType) and _can_read(
            writer.valueType, reader.valueType
        )
    return False


def check_compatibility(
    old: T.StructType, new: T.StructType, level: str = "BACKWARD"
) -> bool:
    """Confluent-semantics compatibility between consecutive versions:

    - BACKWARD: a consumer on `new` can read data produced with `old`
      (add nullable fields, delete fields, widen types).
    - FORWARD: a consumer still on `old` can read data produced with
      `new` (delete nullable fields, add fields, narrow back).
    - FULL: both directions.
    - NONE: always compatible (registry accepts anything).
    """
    level = level.upper()
    if level == "NONE":
        return True
    if level == "BACKWARD":
        return _can_read(old, new)
    if level == "FORWARD":
        return _can_read(new, old)
    if level == "FULL":
        return _can_read(old, new) and _can_read(new, old)
    raise ValueError(f"unknown compatibility level {level!r}")


def register_checked(
    registry: FileSchemaRegistry,
    subject: str,
    struct: T.StructType,
    level: str = "BACKWARD",
) -> RegisteredSchema:
    """Compatibility-gated registration: verify `struct` against the
    subject's LATEST version at `level` — or against EVERY prior version
    for the `*_TRANSITIVE` levels — before publishing (Confluent's two
    check scopes)."""
    base = level.upper().removesuffix("_TRANSITIVE")
    transitive = level.upper().endswith("_TRANSITIVE")
    priors = (
        registry.versions(subject)
        if transitive
        else [d for d in [registry.latest(subject)] if d is not None]
    )
    for doc in priors:
        if doc.schema_type != "spark-struct":
            continue
        if not check_compatibility(doc.struct(), struct, base):
            raise IncompatibleSchemaError(
                f"subject {subject!r}: new schema is not {level}-compatible "
                f"with version {doc.version}"
            )
    return registry.register(subject, json.dumps(struct.jsonValue()))
