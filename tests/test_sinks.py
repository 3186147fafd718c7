"""Sink family tests: HTTP (live local server), vector collection,
instructlab extraction, record shaping, dry-run bulk delivery, registry."""

import glob
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pyspark.sql import functions as F

from debezium_server_spark.sinks import SINK_REGISTRY, get_sink
from debezium_server_spark.sinks.aws_sinks import kinesis_entry, sqs_entry
from debezium_server_spark.sinks.http_sink import HttpSink
from debezium_server_spark.sinks.kafka_sink import to_kafka_frame
from debezium_server_spark.sinks.instructlab_sink import InstructLabSink, TaxonomyRoute
from debezium_server_spark.sinks.messaging_sinks import (
    maybe_compress,
    ordering_key,
    route_partition,
    select_queue,
)
from debezium_server_spark.sinks.redis_sink import MemoryThreshold, build_message
from debezium_server_spark.sinks.vector_sink import VectorCollectionSink, validate_key_type
from tests.fixtures import customers_changelog_df, event


EXPECTED_SINKS = {
    "kafka", "redis", "jdbc", "http", "kinesis", "pubsub", "pubsublite",
    "pulsar", "eventhubs", "nats-jetstream", "nats-streaming", "pravega",
    "rabbitmq", "rabbitmqstream", "rocketmq", "sns", "sqs", "infinispan",
    "vector", "milvus", "qdrant", "instructlab", "fluss", "parquet-upsert",
    "parquet-append",
}


def test_registry_covers_reference_sink_inventory():
    """Every @Named sink in SURVEY.md §2.4 resolves (milvus/qdrant → the
    unified `vector` collection sink)."""
    missing = EXPECTED_SINKS - set(SINK_REGISTRY)
    assert not missing, f"missing sinks: {missing}"


def test_http_sink_aggregated_live(spark, tmp_path):
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append((self.path, dict(self.headers), body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{server.server_port}/hook"
        df = customers_changelog_df(spark)
        sink = HttpSink(url=url, mode="aggregated")
        sink(df, epoch_id=0)
        assert received, "no HTTP deliveries"
        all_events = []
        for _, headers, body in received:
            payload = json.loads(body)
            assert isinstance(payload, list)  # JSON-array aggregation
            all_events.extend(payload)
        assert len(all_events) == 7  # tombstone dropped by prepare()
        ops = sorted(e["op"] for e in all_events)
        assert ops == ["c", "d", "r", "r", "r", "r", "u"]
    finally:
        server.shutdown()


def test_http_debezium_headers_base64():
    h = HttpSink.debezium_headers({"traceId": "abc"})
    assert h == {"X-DEBEZIUM-TRACEID": "YWJj"}


def test_webhooks_signature_spec_vector():
    """Exact parity with StandardWebhooksAuthenticatorTest.java: same
    secret/clock/message-id/body must yield the spec's published
    signature (verifiable at standardwebhooks.com/verify)."""
    from debezium_server_spark.sinks.http_sink import StandardWebhooksAuth

    auth = StandardWebhooksAuth(
        "whsec_MfKQ9r8GKYqrTwjUPD8ILPZIo2LaLaSw", clock=lambda: 1234
    )
    h = auth.headers('{"hello":"world"}', "22bd292a-71ab-46fe-a460-8632d6754ac6")
    assert h["webhook-id"] == "msg_22bd292a-71ab-46fe-a460-8632d6754ac6"
    assert h["webhook-timestamp"] == "1234"
    assert h["webhook-signature"] == "v1,qCVBRIv6rKQVhSJBAmUSE9GkdCdPe2j6xzzkm89UcoA="


def test_webhooks_secret_length_validation():
    from debezium_server_spark.sinks.http_sink import StandardWebhooksAuth

    with pytest.raises(ValueError):
        StandardWebhooksAuth("whsec_c2hvcnQ=")  # 5 bytes decoded: too short
    StandardWebhooksAuth("whsec_" + "QQ==" * 0 + "QUFBQUFBQUFBQUFBQUFBQUFBQUFBQUFB")  # 24 bytes ok


def test_oauth2_token_caching_and_refresh():
    """Token fetched once, cached until 0.9*expires_in, then refreshed —
    OAuth2Authenticator.java's EXPIRATION_BUFFER_MULTIPLIER semantics."""
    from debezium_server_spark.sinks.http_sink import OAuth2Auth

    calls = []
    now = [1000.0]

    def transport(method, url, headers, body, timeout_s):
        calls.append((method, url, headers, body))
        return 200, json.dumps({"access_token": f"tok{len(calls)}", "expires_in": 100})

    auth = OAuth2Auth("http://token", "cid", "csec", scope="read",
                      clock=lambda: now[0], transport=transport)
    auth.authenticate()
    auth.authenticate()  # cached: no second fetch
    assert len(calls) == 1
    assert auth.headers() == {"Authorization": "Bearer tok1"}
    method, url, headers, body = calls[0]
    assert method == "POST" and url == "http://token"
    assert body == "grant_type=client_credentials&scope=read"
    assert headers["Content-Type"] == "application/x-www-form-urlencoded"
    import base64 as b64
    assert headers["Authorization"] == "Basic " + b64.b64encode(b"cid:csec").decode()

    now[0] = 1000.0 + 0.9 * 100 + 1  # past the buffered expiry
    auth.authenticate()
    assert len(calls) == 2 and auth.headers() == {"Authorization": "Bearer tok2"}

    # 401 invalidates the cache so the retry re-fetches
    assert auth.on_unauthorized() is True
    auth.authenticate()
    assert len(calls) == 3


def test_oauth2_client_secret_post_and_get_modes():
    from debezium_server_spark.sinks.http_sink import OAuth2Auth

    calls = []

    def transport(method, url, headers, body, timeout_s):
        calls.append((method, headers, body))
        return 200, json.dumps({"access_token": "t", "expires_in": 60})

    OAuth2Auth("http://token", "cid", "c&sec",
               client_auth_method="client_secret_post",
               transport=transport).authenticate()
    method, headers, body = calls[-1]
    assert "Authorization" not in headers
    assert body == "grant_type=client_credentials&client_id=cid&client_secret=c%26sec"

    OAuth2Auth("http://token", "cid", "csec", token_http_method="GET",
               transport=transport).authenticate()
    method, headers, body = calls[-1]
    assert method == "GET" and body is None
    assert headers["Authorization"].startswith("Basic ")


def test_http_sink_oauth2_401_retry_live(spark):
    """Full sink path against a live stub server: first data POST gets a
    401, the sink re-fetches a token and retries, second POST succeeds."""
    from debezium_server_spark.sinks.http_sink import OAuth2Auth

    tokens, hooks = [], []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if self.path == "/token":
                tokens.append(body)
                payload = json.dumps(
                    {"access_token": f"tok{len(tokens)}", "expires_in": 3600}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            hooks.append((dict(self.headers), body))
            status = 401 if len(hooks) == 1 else 200
            self.send_response(status)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_port}"
        auth = OAuth2Auth(f"{base}/token", "cid", "csec")
        sink = HttpSink(url=f"{base}/hook", mode="aggregated", auth=auth)
        # one partition → one task → one auth instance: the token cache
        # is per-executor state (foreachPartition serializes the sink),
        # which is the only correct distribution of a mutable token
        sink(customers_changelog_df(spark).coalesce(1), epoch_id=0)
        assert len(tokens) == 2  # initial fetch + post-401 re-fetch
        assert len(hooks) == 2  # 401 then retried OK
        assert hooks[0][0]["Authorization"] == "Bearer tok1"
        assert hooks[1][0]["Authorization"] == "Bearer tok2"
        assert hooks[0][1] == hooks[1][1]  # identical body replayed
    finally:
        server.shutdown()


def test_http_sink_webhooks_live(spark):
    """Webhook-signed delivery: the recorded request verifies against the
    recomputed HMAC over the exact received body."""
    import base64 as b64
    import hashlib
    import hmac as hmac_mod

    from debezium_server_spark.sinks.http_sink import StandardWebhooksAuth

    secret_key = b"0123456789abcdef01234567"  # 24 bytes
    secret = "whsec_" + b64.b64encode(secret_key).decode()
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            received.append((dict(self.headers), body))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_port}/hook"
        sink = HttpSink(url=url, mode="aggregated", auth=StandardWebhooksAuth(secret))
        sink(customers_changelog_df(spark), epoch_id=0)
        assert received
        for headers, body in received:
            msg_id = headers["webhook-id"]
            ts = headers["webhook-timestamp"]
            assert msg_id.startswith("msg_")
            to_sign = f"{msg_id}.{ts}.{body.decode()}".encode()
            expected = "v1," + b64.b64encode(
                hmac_mod.new(secret_key, to_sign, hashlib.sha256).digest()
            ).decode()
            assert headers["webhook-signature"] == expected
    finally:
        server.shutdown()


def test_dry_run_bulk_delivery(spark, tmp_path):
    """RemoteBulkSink partition/chunk path via the dry-run client."""
    out = str(tmp_path / "chunks")
    df = customers_changelog_df(spark)
    sink = get_sink("pubsub", dry_run_dir=out)
    sink(df, epoch_id=0)
    recs = []
    for p in glob.glob(f"{out}/*.jsonl"):
        recs.extend(json.loads(line) for line in open(p))
    assert len(recs) == 7
    assert all(r["sink"] == "pubsub" for r in recs)
    assert all("ordering_key" in r for r in recs)


def test_vector_sink_upsert_delete(spark, tmp_path):
    rows = [
        event(1, "c", None, None, lsn=1, dest="vec.docs"),
        event(2, "c", None, None, lsn=2, dest="vec.docs"),
        event(1, "u", None, None, lsn=3, dest="vec.docs"),
        event(2, "d", None, None, lsn=4, dest="vec.docs"),
    ]
    # build envelope with embedding rows
    def emb_after(i, vec, cat):
        return {"id": i, "embedding": vec, "category": cat, "text": f"doc{i}"}

    data = []
    for e, after in zip(rows, [emb_after(1, [1.0, 0.0], "a"), emb_after(2, [0.0, 1.0], "b"),
                               emb_after(1, [0.5, 0.5], "a2"), None]):
        v = e["value"]
        if v is not None:
            v["after"] = after
            v["before"] = None
        data.append(e)
    schema = (
        "destination string, key struct<id:int>, "
        "value struct<op:string, before struct<id:int,embedding:array<float>,category:string,text:string>, "
        "after struct<id:int,embedding:array<float>,category:string,text:string>, "
        "source struct<version:string,connector:string,name:string,ts_ms:bigint,db:string,"
        "schema:string,table:string,lsn:bigint,snapshot:string>, ts_ms bigint>, "
        "headers array<struct<key:string,value:string>>, partition int"
    )
    df = spark.createDataFrame(data, schema=schema)
    sink = VectorCollectionSink(root_path=str(tmp_path / "collections"), key_field="id",
                                vector_field="embedding")
    sink(df, epoch_id=0)
    coll = sink.read_collection(spark, "vec.docs")
    rows_out = {r["id"]: r for r in coll.collect()}
    assert set(rows_out) == {1}  # 2 deleted; 1 upserted twice
    assert [round(x, 1) for x in rows_out[1]["embedding"]] == [0.5, 0.5]
    payload = json.loads(rows_out[1]["payload"])
    assert payload == {"category": "a2", "text": "doc1"}  # key+vector excluded


def test_vector_key_validation(spark):
    df = spark.createDataFrame(
        [(("not-a-uuid",),)], "key struct<id:string>"
    )
    with pytest.raises(ValueError, match="UUID"):
        validate_key_type(df, "id")
    ok = spark.createDataFrame(
        [(("123e4567-e89b-12d3-a456-426614174000",),)], "key struct<id:string>"
    )
    validate_key_type(ok, "id")  # no raise


def test_milvus_qdrant_named_sinks_key_rules(spark):
    """Per-store key restrictions: milvus takes any string; qdrant only
    UUID-shaped strings; both reject multi-field keys."""
    from debezium_server_spark.sinks.vector_sink import MilvusSink, QdrantSink

    assert {"milvus", "qdrant", "vector"} <= set(SINK_REGISTRY)
    milvus = MilvusSink(root_path="/tmp/unused")
    qdrant = QdrantSink(root_path="/tmp/unused")

    any_string = spark.createDataFrame([(("k-1",),)], "key struct<id:string>")
    milvus.validate_key(any_string)  # milvus: any STRING ok
    with pytest.raises(ValueError, match="UUID"):
        qdrant.validate_key(any_string)
    uuid_key = spark.createDataFrame(
        [(("123e4567-e89b-12d3-a456-426614174000",),)], "key struct<id:string>"
    )
    qdrant.validate_key(uuid_key)

    two_fields = spark.createDataFrame(
        [((1, "x"),)], "key struct<id:bigint,other:string>"
    )
    with pytest.raises(ValueError, match="exactly one field"):
        milvus.validate_key(two_fields)
    with pytest.raises(ValueError, match="exactly one field"):
        qdrant.validate_key(two_fields)


def test_qdrant_vector_fields_config():
    """`vector.fields` parsing: per-collection override, duplicate
    collection is an error (QdrantMessageFactory.java:47-76)."""
    from debezium_server_spark.sinks.vector_sink import QdrantSink, parse_vector_fields

    sink = QdrantSink(root_path="/tmp/unused",
                      vector_fields="db_docs:emb, db_imgs:pixels")
    assert sink.vector_field_for("db_docs") == "emb"
    assert sink.vector_field_for("db_imgs") == "pixels"
    assert sink.vector_field_for("other") == "embedding"  # default

    with pytest.raises(ValueError, match="[Mm]ultiple vector fields"):
        parse_vector_fields("c:a,c:b")
    with pytest.raises(ValueError, match="[Ii]nvalid vector field"):
        parse_vector_fields("justacollection")


def test_qdrant_payload_include_list(spark, tmp_path):
    """Per-collection payload include-list narrows the payload fields
    (fieldNamesPerCollection semantics)."""
    from debezium_server_spark.sinks.vector_sink import QdrantSink

    schema = (
        "destination string, key struct<id:int>, "
        "value struct<op:string, before struct<id:int,embedding:array<float>,category:string,text:string>, "
        "after struct<id:int,embedding:array<float>,category:string,text:string>, "
        "source struct<version:string,connector:string,name:string,ts_ms:bigint,db:string,"
        "schema:string,table:string,lsn:bigint,snapshot:string>, ts_ms bigint>, "
        "headers array<struct<key:string,value:string>>, partition int"
    )
    e = event(1, "c", None, None, lsn=1, dest="vec.docs")
    e["value"]["after"] = {"id": 1, "embedding": [1.0, 0.0], "category": "a", "text": "doc1"}
    e["value"]["before"] = None
    df = spark.createDataFrame([e], schema=schema)
    sink = QdrantSink(root_path=str(tmp_path / "collections"), key_field="id",
                      payload_fields={"vec_docs": ["category"]})
    sink(df, epoch_id=0)
    row = sink.read_collection(spark, "vec.docs").first()
    assert json.loads(row["payload"]) == {"category": "a"}  # text excluded


def test_instructlab_extraction(spark, tmp_path):
    schema = (
        "destination string, key struct<id:int>, "
        "value struct<op:string, after struct<id:int,question:string,answer:string,context:string>>, "
        "headers array<struct<key:string,value:string>>, partition int"
    )
    data = [
        {"destination": "tax.qna", "key": {"id": 1},
         "value": {"op": "c", "after": {"id": 1, "question": "Q1?", "answer": "A1", "context": "C1"}}},
        {"destination": "tax.qna", "key": {"id": 2},
         "value": {"op": "c", "after": {"id": 2, "question": "", "answer": "A2", "context": None}}},
        {"destination": "other.topic", "key": {"id": 3},
         "value": {"op": "c", "after": {"id": 3, "question": "Q3?", "answer": "A3", "context": None}}},
    ]
    df = spark.createDataFrame(data, schema=schema)
    sink = InstructLabSink(root_path=str(tmp_path), routes=[TaxonomyRoute(r"^tax\.", "knowledge/demo")])
    sink(df, 0)
    import yaml
    qna = yaml.safe_load(open(tmp_path / "knowledge/demo/qna.yml"))
    assert qna["seed_examples"] == [{"question": "Q1?", "answer": "A1", "context": "C1"}]


def test_record_shaping_helpers():
    rec = {"key_json": '{"id":7}', "value_json": '{"x":1}', "headers_map": None,
           "destination": "t", "partition": 2}
    assert ordering_key(rec) == '{"id":7}'
    assert ordering_key(rec, "constant", "fixed") == "fixed"
    body, compressed = maybe_compress(b"x" * 100, threshold=10)
    assert compressed and len(body) < 100
    assert maybe_compress(b"x", threshold=10) == (b"x", False)
    assert 0 <= select_queue(rec, 4) < 4
    assert route_partition(rec, "explicit", 4) == 2
    with pytest.raises(ValueError):
        route_partition({"partition": 9}, "explicit", 4)
    assert route_partition(rec, "hash", 4) == select_queue(rec, 4)
    k = kinesis_entry(rec)
    assert k["PartitionKey"] == '{"id":7}' and k["Data"] == b'{"x":1}'
    s = sqs_entry(rec, 0, fifo=True)
    assert s["MessageGroupId"] == '{"id":7}' and len(s["MessageDeduplicationId"]) == 32
    assert build_message(rec) == {'{"id":7}': '{"x":1}'}
    ext = build_message({**rec, "headers_map": {"h": "v"}}, "extended")
    assert ext == {"key": '{"id":7}', "value": '{"x":1}', "header.h": "v"}


def test_memory_threshold_backpressure():
    calls = []
    usage = iter([100, 100, 10])
    mt = MemoryThreshold(lambda: (next(usage), 200), limit_mb=50 // (1024 * 1024) + 1)
    mt.limit_bytes = 50  # tiny for the test
    assert mt.wait_until_writable(sleep=lambda s: calls.append(s))
    assert len(calls) == 2  # waited twice, then writable
    mt_off = MemoryThreshold(lambda: (10**9, 0), limit_mb=0)
    assert mt_off.wait_until_writable()  # disabled ⇒ always writable


def test_kafka_frame_shape(spark):
    df = customers_changelog_df(spark)
    frame = to_kafka_frame(df)
    assert frame.columns == ["topic", "key", "value", "headers", "partition"]
    dtypes = dict(frame.dtypes)
    assert dtypes["key"] == "binary" and dtypes["value"] == "binary"
    row = frame.filter("topic is not null").first()
    assert row["topic"] == "testc.inventory.customers"


def _dialect_fetch(dialect, db, sql):
    """Read back through the dialect's own driver."""
    if dialect == "sqlite":
        import sqlite3

        con = sqlite3.connect(db)
    else:
        import duckdb

        con = duckdb.connect(db)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


@pytest.mark.parametrize("dialect", ["sqlite", "duckdb"])
def test_dbapi_sink_live_upsert_delete_replay(spark, tmp_path, dialect):
    """Live SQL end-to-end against BOTH in-container dialects (stdlib
    sqlite3 and duckdb — the reference's JDBC sink is
    dialect-resolving, JdbcChangeConsumer.java:102-128, and the
    portable-SQL claim needs a second dialect to mean anything):
    create/update/delete apply with PK conflict handling; an exact
    epoch replay is a no-op (committed-epoch marker); a re-applied
    batch converges (idempotent statement set)."""
    from debezium_server_spark.sinks import get_sink

    db = str(tmp_path / f"sink.{dialect}.db")
    sink = get_sink("dbapi", dsn=db, key_fields=("id",), dialect=dialect)
    assert sink.validate_connection().ok

    def ev(key, op, after, lsn, before=None):
        return {
            "destination": "public.users",
            "key": {"id": key},
            "value": {"op": op, "before": before, "after": after,
                      "source": {"lsn": lsn}, "ts_ms": 1700000000000 + lsn},
            "headers": [], "partition": 0,
        }

    schema = (
        "destination string, key struct<id:long>, "
        "value struct<op:string, before struct<id:long,name:string>, "
        "after struct<id:long,name:string>, source struct<lsn:long>, ts_ms long>, "
        "headers array<struct<key:string,value:string>>, partition int"
    )
    batch1 = spark.createDataFrame(
        [ev(1, "c", {"id": 1, "name": "a"}, 1),
         ev(2, "c", {"id": 2, "name": "b"}, 2),
         ev(1, "u", {"id": 1, "name": "a2"}, 3)],
        schema,
    )
    sink(batch1, epoch_id=0)
    q = "SELECT id, name FROM t_public_users"
    rows = sorted(_dialect_fetch(dialect, db, q))
    assert rows == [(1, "a2"), (2, "b")]  # latest-per-key within the batch

    # epoch replay: marker short-circuits; table unchanged
    sink(batch1, epoch_id=0)
    assert sorted(_dialect_fetch(dialect, db, q)) == rows

    batch2 = spark.createDataFrame(
        [ev(2, "d", None, 4, before={"id": 2, "name": "b"}),
         ev(3, "c", {"id": 3, "name": "c"}, 5)],
        schema,
    )
    sink(batch2, epoch_id=1)
    rows2 = sorted(_dialect_fetch(dialect, db, q))
    assert rows2 == [(1, "a2"), (3, "c")]
    # epochs recorded per destination
    marks = _dialect_fetch(
        dialect, db, "SELECT epoch FROM __dss_epochs ORDER BY epoch")
    assert marks == [(0,), (1,)]


@pytest.mark.parametrize("dialect", ["sqlite", "duckdb"])
def test_dbapi_sink_complex_and_temporal_columns(spark, tmp_path, dialect):
    """Structs/arrays land as JSON text, timestamps as their string
    rendering (to_json rejects bare scalars — regression guard)."""
    from debezium_server_spark.sinks import get_sink

    db = str(tmp_path / f"typed.{dialect}.db")
    sink = get_sink("dbapi", dsn=db, key_fields=("id",), dialect=dialect)
    schema = (
        "destination string, key struct<id:long>, "
        "value struct<op:string, before struct<id:long>, "
        "after struct<id:long, ts timestamp, tags array<string>, "
        "meta struct<a:int,b:string>>, source struct<lsn:long>, ts_ms long>, "
        "headers array<struct<key:string,value:string>>, partition int"
    )
    import datetime

    batch = spark.createDataFrame(
        [{
            "destination": "t", "key": {"id": 1},
            "value": {"op": "c", "before": None,
                      "after": {"id": 1,
                                "ts": datetime.datetime(2024, 1, 2, 3, 4, 5),
                                "tags": ["x", "y"],
                                "meta": {"a": 7, "b": "z"}},
                      "source": {"lsn": 1}, "ts_ms": 1},
            "headers": [], "partition": 0,
        }],
        schema,
    )
    sink(batch, epoch_id=0)
    (row,) = _dialect_fetch(dialect, db, "SELECT id, ts, tags, meta FROM t_t")
    assert row[0] == 1
    assert row[1].startswith("2024-01-02 03:04:05")
    import json as _json

    assert _json.loads(row[2]) == ["x", "y"]
    assert _json.loads(row[3]) == {"a": 7, "b": "z"}
