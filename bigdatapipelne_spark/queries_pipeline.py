"""Pipeline-surface queries: the card-schema medallion chain through the
real operator path, nested-struct flattening, serving-layer semantics
(TTL view, upsert), and the drained Structured Streaming fraud query.

The card pipeline has no driver table of its own, so a deterministic card
frame is *derived from the events table* with engine-neutral expressions
(integer modulo, string concat, lpad — identical in Spark and DuckDB).
The Spark side then runs the genuine medallion operators
(``apply_mapping`` with dotted paths + casts, ``flatten_structs``,
``drop_fields``, ``group_agg``); the oracle recomputes the same mart
directly in SQL — certifying the operator library, not a lookalike.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatapipelne_spark.operators.project import flatten_structs
from bigdatapipelne_spark.operators.serving import (
    key_lookup,
    live_view,
    serving_projection,
    upsert_batch,
)
from bigdatapipelne_spark.plans.medallion import spec_transform, stage_transform
from bigdatapipelne_spark.queries import OSUM, _FRAUD_WINDOWS_SQL, query
from bigdatapipelne_spark.sources.testdata import load_table as t

# ---------------------------------------------------------------------------
# Card-schema medallion (raw -> stage -> spec) derived from events
# ---------------------------------------------------------------------------

_TIPOS = ("unlimited", "black", "platinum", "gold", "standard")
_CORES = ("preto", "prata", "amarelo", "azul", "verde")
_ESTADOS = ("SP", "RJ", "MG")


def _pick(options: tuple[str, ...], idx_col) -> F.Column:
    return F.element_at(
        F.array(*[F.lit(o) for o in options]), (idx_col + 1).cast("int")
    )


def card_raw_from_events(ev: DataFrame) -> DataFrame:
    """Deterministic card-transaction raw frame (FIXTURES.md A1 shape, incl.
    the nested ``localizacao`` struct with *string* lat/lng) from events.
    Lat/lng are built as strings digit-by-digit — never formatted from
    floats — so the later string->double cast parses identically in any
    engine."""
    lat = F.concat(F.lit("-23."), (F.col("user_id") % 100).cast("string"))
    lng = F.concat(F.lit("-46."), (F.col("event_id") % 100).cast("string"))
    cidade = F.concat(F.lit("cidade_"), (F.col("user_id") % 27).cast("string"))
    estado = _pick(_ESTADOS, F.col("user_id") % 3)
    return ev.select(
        F.concat(F.lit("user "), F.col("user_id").cast("string")).alias("nome"),
        F.lpad(F.col("user_id").cast("string"), 11, "0").alias("cpf"),
        F.col("value").alias("valor"),
        F.col("event_type").alias("bandeira"),
        (F.col("user_id") % 50).cast("string").alias("numero_cartao"),
        F.lpad((F.col("event_id") % 1000).cast("string"), 3, "0").alias("cvv"),
        F.concat(
            F.lpad(((F.col("user_id") % 12) + 1).cast("string"), 2, "0"), F.lit("/28")
        ).alias("exp"),
        _pick(_TIPOS, F.col("user_id") % 5).alias("tipo_cartao"),
        _pick(_CORES, F.col("event_id") % 5).alias("cor_cartao"),
        F.when(F.col("value") > 50, F.lit("credito"))
        .otherwise(F.lit("debito"))
        .alias("tipo_transacao"),
        F.struct(
            lat.alias("lat"), lng.alias("lng"), cidade.alias("cidade"), estado.alias("estado")
        ).alias("localizacao"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("horario_transacao"),
        estado.alias("estado"),
        F.col("event_id").cast("string").alias("transaction_id"),
    )


_CARD_STAGE_SQL = """
    SELECT event_type AS bandeira,
           CAST(user_id % 50 AS VARCHAR) AS numero_cartao,
           lpad(CAST((user_id % 12) + 1 AS VARCHAR), 2, '0') || '/28' AS exp,
           (['unlimited','black','platinum','gold','standard'])[CAST(user_id % 5 AS INT) + 1]
             AS tipo_cartao,
           (['preto','prata','amarelo','azul','verde'])[CAST(event_id % 5 AS INT) + 1]
             AS cor_cartao,
           CASE WHEN value > 50 THEN 'credito' ELSE 'debito' END AS tipo_transacao,
           'cidade_' || CAST(user_id % 27 AS VARCHAR) AS cidade,
           CAST('-23.' || CAST(user_id % 100 AS VARCHAR) AS DOUBLE) AS latitude,
           CAST('-46.' || CAST(event_id % 100 AS VARCHAR) AS DOUBLE) AS longitude,
           (['SP','RJ','MG'])[CAST(user_id % 3 AS INT) + 1] AS estado,
           value AS valor
    FROM events
"""


@query(
    "card_spec_mart",
    oracle=f"""
    WITH stage AS ({_CARD_STAGE_SQL})
    SELECT bandeira, numero_cartao, exp, tipo_cartao, cor_cartao,
           tipo_transacao, cidade, latitude, longitude, estado,
           {OSUM('valor')} AS sum_valor
    FROM stage
    GROUP BY 1,2,3,4,5,6,7,8,9,10
    """,
)
def card_spec_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full medallion transform chain on the card schema: raw (nested
    localizacao) -> ApplyMapping 16 fields incl. loc-estado rename and
    string->double lat/lng (glue_scripts/stage.py:25-48) -> DropFields ->
    10-dim SUM mart (glue_scripts/spec.py:40-64) — all through
    plans/medallion.py's operator pipeline. The disk form (partitioned
    parquet writes, gzip JSON raw, corrupt capture) is exercised in
    tests/test_medallion.py."""
    raw = card_raw_from_events(t(spark, sf_dir, "events"))
    stage = stage_transform(raw)
    return spec_transform(stage)


@query(
    "card_medallion_disk",
    oracle=f"""
    WITH stage AS ({_CARD_STAGE_SQL})
    SELECT bandeira, numero_cartao, exp, tipo_cartao, cor_cartao,
           tipo_transacao, cidade, latitude, longitude, estado,
           {OSUM('valor')} AS sum_valor
    FROM stage
    GROUP BY 1,2,3,4,5,6,7,8,9,10
    """,
)
def card_medallion_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The medallion chain FROM DISK: raw landed as gzip JSON-lines
    Hive-partitioned by estado (S2/S4/S5, sources/io.py:
    write_json_partitioned), a deliberately-corrupt line dropped at the
    raw scan (S5 bad-record capture, io.py:read_json DROPMALFORMED), then
    run_medallion's stage parquet write -> re-read -> spec parquet write
    -> re-read (S6-S9, plans/medallion.py:run_medallion). Same oracle as
    card_spec_mart: the disk round-trip (JSON double serialization,
    partition-column restore from Hive paths, snappy parquet) must be
    value-lossless end to end."""
    import os

    from bigdatapipelne_spark.plans.medallion import run_medallion
    from bigdatapipelne_spark.sources.io import write_json_partitioned

    raw = card_raw_from_events(t(spark, sf_dir, "events"))
    tmp = tempfile.mkdtemp(prefix="medallion_disk_")
    raw_path = os.path.join(tmp, "raw")
    write_json_partitioned(raw, raw_path, ["estado"])
    # A malformed line in one partition: the raw scan must drop it (the
    # reference routes such records to the Firehose error/ prefix) without
    # perturbing the mart.
    with open(os.path.join(raw_path, "estado=SP", "corrupt.json"), "w") as f:
        f.write('{"valor": "not parseable as the schema says"\n')
    stage_path = os.path.join(tmp, "stage")
    spec_path = os.path.join(tmp, "spec")
    run_medallion(spark, raw_path, stage_path, spec_path)
    return spark.read.parquet(spec_path).select(*_SPEC_MART_COLS)


_SPEC_MART_COLS = [
    "bandeira", "numero_cartao", "exp", "tipo_cartao", "cor_cartao",
    "tipo_transacao", "cidade", "latitude", "longitude", "estado", "sum_valor",
]


@query(
    "card_stage_schema",
    oracle="""
    SELECT 'bandeira:string,cidade:string,cor_cartao:string,cpf:string,cvv:string,'
        || 'estado:string,exp:string,horario_transacao:string,latitude:double,'
        || 'loc-estado:string,longitude:double,nome:string,numero_cartao:string,'
        || 'tipo_cartao:string,tipo_transacao:string,valor:double' AS stage_schema
    """,
)
def card_stage_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-parity probe: the stage transform must produce exactly the 16
    ApplyMapping output columns with the reference's names (including
    ``loc-estado``) and types (FIXTURES.md A2)."""
    raw = card_raw_from_events(t(spark, sf_dir, "events"))
    stage = stage_transform(raw)
    desc = ",".join(
        f"{f.name}:{f.dataType.simpleString()}" for f in sorted(stage.schema, key=lambda f: f.name)
    )
    return spark.createDataFrame([(desc,)], "stage_schema string")


# ---------------------------------------------------------------------------
# Nested-struct flattening (P2) on a genuinely nested frame
# ---------------------------------------------------------------------------


@query(
    "flatten_nested",
    oracle="""
    SELECT event_id, user_id AS u_id, event_type AS u_meta_t, value AS u_meta_v
    FROM events
    """,
)
def flatten_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: recursive struct flatten on a two-level nested frame built from
    events — ``u.meta.v`` becomes ``u_meta_v`` (operators/project.py:
    flatten_structs; parity with Glue unnest, glue_scripts/stage.py:48)."""
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        F.struct(
            F.col("user_id").alias("id"),
            F.struct(
                F.col("event_type").alias("t"), F.col("value").alias("v")
            ).alias("meta"),
        ).alias("u"),
    )
    return flatten_structs(ev)


# ---------------------------------------------------------------------------
# Serving layer: TTL-filtered live view (W7) and batch upsert (L3)
# ---------------------------------------------------------------------------

# Fixed "now" inside the events time range (2024-01-01..2024-01-30), so the
# TTL filter is deterministic and actually splits the data: alerts stamped
# from event time + 30 d expire when event ts < NOW - 30 d... using a NOW
# past the range start keeps a nontrivial subset on each side.
_LIVE_NOW_EPOCH = 1707350400  # 2024-02-08 00:00:00 UTC


@query(
    "serving_live",
    oracle=f"""
    SELECT user_id, event_id, ts, value,
           CAST(floor(epoch(ts)) + 2592000 AS BIGINT) AS ttl
    FROM events
    WHERE value > 50.0
      AND CAST(floor(epoch(ts)) + 2592000 AS BIGINT) > {_LIVE_NOW_EPOCH}
    """,
)
def serving_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: the TTL-honoring live view over the serving table — expired
    records (ttl <= now) disappear, parity with DynamoDB TTL expiry
    (realtime.py:219). ``now`` is pinned for determinism."""
    ev = t(spark, sf_dir, "events").filter(F.col("value") > 50.0)
    serving = serving_projection(
        ev, key_col="user_id", id_col="event_id", time_col="ts", value_col="value"
    )
    return live_view(serving, now_epoch=F.lit(_LIVE_NOW_EPOCH))


@query(
    "serving_upsert",
    oracle=f"""
    WITH serving AS (
      SELECT user_id, event_id, ts, value,
             CAST(floor(epoch(ts)) + 2592000 AS BIGINT) AS ttl
      FROM events WHERE value > 50.0
    ),
    updates AS (
      SELECT user_id, event_id, ts, value,
             CAST(floor(epoch(ts)) + 5184000 AS BIGINT) AS ttl
      FROM events WHERE value > 90.0
    )
    SELECT s.* FROM serving s
    WHERE NOT EXISTS (
      SELECT 1 FROM updates u
      WHERE u.user_id = s.user_id AND u.event_id = s.event_id
    )
    UNION ALL
    SELECT * FROM updates
    """,
)
def serving_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: last-writer-wins merge — records re-flagged with a longer TTL
    replace their serving rows, the rest survive (operators/serving.py:
    upsert_batch; parity with DynamoDB put_item upsert semantics)."""
    ev = t(spark, sf_dir, "events")
    serving = serving_projection(
        ev.filter(F.col("value") > 50.0),
        key_col="user_id", id_col="event_id", time_col="ts", value_col="value",
    )
    updates = serving_projection(
        ev.filter(F.col("value") > 90.0),
        key_col="user_id", id_col="event_id", time_col="ts", value_col="value",
        ttl_seconds=60 * 24 * 3600,
    )
    return upsert_batch(serving, updates, ["user_id", "event_id"])


# ---------------------------------------------------------------------------
# Structured Streaming fraud drain (W1-W8 live in the plan; the drained
# result is SQL-checkable: append mode emits exactly the windows closed by
# the final watermark = max(ts) - 10 s).
# ---------------------------------------------------------------------------


@query(
    "fraud_stream_drain",
    oracle=f"""
    WITH agg AS ({_FRAUD_WINDOWS_SQL}),
    mx AS (SELECT max(ts) AS m FROM events)
    SELECT agg.* FROM agg, mx
    WHERE window_end <= m - INTERVAL '10 seconds'
    """,
)
def fraud_stream_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's realtime pipeline as Structured Streaming, drained:
    file source with explicit schema (S11) -> 10 s watermark (W1) -> 10 s
    tumble + exact SUM + HAVING (A3/W2/P4) -> append (W4) parquet sink with
    checkpoint (W5), availableNow trigger (W8). Emitted rows are exactly
    the windows whose end <= final watermark — which the oracle computes in
    SQL, so even the *late-data/emission* semantics are hash-checked."""
    import os

    from bigdatapipelne_spark.streaming.fraud import (
        fraud_alerts,
        read_events_parquet_stream,
        run_available_now,
    )

    src = read_events_parquet_stream(spark, f"{sf_dir}/events.parquet")
    alerts = fraud_alerts(src)

    tmp = tempfile.mkdtemp(prefix="fraud_stream_")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    run_available_now(alerts, out, cp)
    return spark.read.parquet(out).select(
        "user_id", "window_start", "window_end", "sum_value", "n_events"
    )


@query(
    "purchase_view_outer_drain",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, event_id AS view_id, ts AS vts
          FROM events WHERE event_type = 'view'),
    wm AS (SELECT least(
             (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'purchase'),
             (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'view')
           ) - 10000 AS wm_ms)
    SELECT p.user_id, p.purchase_id, p.pts, v.view_id, v.vts
    FROM p JOIN v ON p.user_id = v.user_id
       AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL '6 hours'
    UNION ALL
    SELECT p.user_id, p.purchase_id, p.pts, NULL, NULL
    FROM p, wm
    WHERE epoch_ms(p.pts) < wm_ms
      AND NOT EXISTS (SELECT 1 FROM v
                      WHERE v.user_id = p.user_id
                        AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL '6 hours')
    """,
)
def purchase_view_outer_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream join, drained: matched purchase/view pairs
    emit like the inner join; an unmatched purchase emits a null-extended
    row only once the global watermark (min across both streams, 10 s
    delay) strictly passes its event time — match impossible from then on,
    since arriving views satisfy vts >= watermark and the join needs
    vts <= pts. Purchases at or inside the watermark stay unemitted (the
    append-tail rule; boundary behavior probed: pts == wm holds back).
    The oracle reproduces the inner part AND the eviction rule, so the
    outer emission semantics are hash-checked.

    Runs under the ROCKSDB state store (round-10 verdict #3): at 100 TB
    the default on-heap HDFSBackedStateStoreProvider is the stream-stream
    join's real scale risk (four state stores per partition held in
    executor heap), so the at-scale provider is certified end-to-end HERE
    — this gate hash-checks RocksDB-backed output against the same oracle
    every round, while the inner/full-outer twins stay on the default
    provider (both backends stay driver-certified). Provider A/B output
    identity is additionally pinned in tests/test_streaming.py."""
    import os

    from bigdatapipelne_spark.streaming.fraud import (
        ROCKSDB_PROVIDER,
        read_events_parquet_stream,
        run_available_now,
    )
    from bigdatapipelne_spark.streaming.joins import (
        correlate_streams,
        size_state_partitions,
    )

    def side(event_type: str, cols: dict[str, str]) -> DataFrame:
        s = read_events_parquet_stream(spark, f"{sf_dir}/events.parquet")
        s = s.filter(F.col("event_type") == event_type)
        return s.select("user_id", *[F.col(c).alias(a) for c, a in cols.items()])

    purchases = side("purchase", {"event_id": "purchase_id", "ts": "pts"})
    views = side("view", {"event_id": "view_id", "ts": "vts"})
    joined = correlate_streams(
        purchases, views, key="user_id", left_time="pts", right_time="vts",
        lookback="6 hours", how="left_outer",
    )

    tmp = tempfile.mkdtemp(prefix="ss_outer_")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    # State volume ~ purchases+views rows; the metadata-only total-row
    # count is a one-sided (over) proxy. See size_state_partitions.
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    run_available_now(
        joined, out, cp,
        state_partitions=size_state_partitions(n_events),
        state_store_provider=ROCKSDB_PROVIDER,
    )
    return spark.read.parquet(out).select(
        "user_id", "purchase_id", "pts", "view_id", "vts"
    )


@query(
    "stream_dedup_drain",
    oracle="""
    SELECT event_id, ts, user_id, value FROM events
    """,
)
def stream_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup drained end-to-end: the events table is landed
    TWICE into a staging dir (an at-least-once source replaying every
    record), streamed with dropDuplicatesWithinWatermark on event_id
    (streaming/sessions.py: deduped_stream), and the drained sink must
    equal the original table exactly — first-writer-wins collapses each
    replayed pair, certified against the plain SELECT of events."""
    import os

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from bigdatapipelne_spark.streaming.fraud import (
        read_events_stream,
        run_available_now,
    )
    from bigdatapipelne_spark.streaming.sessions import deduped_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")

    tmp = tempfile.mkdtemp(prefix="stream_dedup_")
    src_dir = os.path.join(tmp, "src")
    # Stage the doubled source: load_table already surfaces ts as a real
    # timestamp, so the staged parquet is plain TIMESTAMP(MICROS).
    once = t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    once.unionAll(once).write.mode("overwrite").parquet(src_dir)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    sdf = read_events_stream(spark, src_dir, schema=schema, fmt="parquet")
    deduped = deduped_stream(sdf, keys=["event_id"], watermark="10 seconds")

    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    run_available_now(deduped, out, cp)
    return spark.read.parquet(out).select("event_id", "ts", "user_id", "value")


@query(
    "purchase_view_stream_join",
    oracle="""
    SELECT p.user_id, p.purchase_id, p.pts, p.purchase_value,
           v.view_id, v.vts
    FROM (SELECT user_id, event_id AS purchase_id, ts AS pts,
                 value AS purchase_value
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, event_id AS view_id, ts AS vts
          FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.vts <= p.pts
     AND v.vts >= p.pts - INTERVAL '6 hours'
    """,
)
def purchase_view_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join, drained: each purchase paired with the
    same user's views from the preceding 6 h (streaming/joins.py). Inner
    emission doesn't wait for the watermark, so the drained result equals
    the batch join exactly — certified against the plain SQL join."""
    import os

    from bigdatapipelne_spark.streaming.fraud import (
        read_events_parquet_stream,
        run_available_now,
    )
    from bigdatapipelne_spark.streaming.joins import (
        correlate_streams,
        size_state_partitions,
    )

    def side(event_type: str, cols: dict[str, str]) -> DataFrame:
        s = read_events_parquet_stream(spark, f"{sf_dir}/events.parquet")
        s = s.filter(F.col("event_type") == event_type)
        return s.select("user_id", *[F.col(c).alias(a) for c, a in cols.items()])

    purchases = side(
        "purchase",
        {"event_id": "purchase_id", "ts": "pts", "value": "purchase_value"},
    )
    views = side("view", {"event_id": "view_id", "ts": "vts"})
    joined = correlate_streams(
        purchases, views, key="user_id", left_time="pts", right_time="vts",
        lookback="6 hours",
    )

    tmp = tempfile.mkdtemp(prefix="ss_join_")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    run_available_now(
        joined, out, cp, state_partitions=size_state_partitions(n_events)
    )
    return spark.read.parquet(out).select(
        "user_id", "purchase_id", "pts", "purchase_value", "view_id", "vts"
    )


@query(
    "enriched_stream_drain",
    oracle="""
    WITH tiers AS (
      SELECT user_id,
             CASE WHEN SUM(CAST(value AS DECIMAL(12,2))) >= 4500 THEN 'gold'
                  WHEN SUM(CAST(value AS DECIMAL(12,2))) >= 3000 THEN 'silver'
                  ELSE 'standard' END AS tier
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type, e.value, t.tier
    FROM events e JOIN tiers t USING (user_id)
    """,
)
def enriched_stream_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join, drained: the stateless Structured
    Streaming pattern that decorates an event stream with a slowly-changing
    dimension — here a per-user spend tier computed in batch. The static
    side is broadcast into every micro-batch (no watermark, no state
    store: stream-static inner joins are stateless by construction), so at
    scale the stream never shuffles — each batch is a map-side hash join
    against the broadcast dim. Tier thresholds compare DECIMAL sums, so
    the batch oracle reproduces the dimension exactly (double sums are
    order-dependent; decimal sums are not)."""
    import os

    from bigdatapipelne_spark.streaming.fraud import (
        read_events_parquet_stream,
        run_available_now,
    )

    dim = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).alias("_sv"))
        .select(
            "user_id",
            F.when(F.col("_sv") >= 4500, "gold")
            .when(F.col("_sv") >= 3000, "silver")
            .otherwise("standard")
            .alias("tier"),
        )
    )
    src = read_events_parquet_stream(spark, f"{sf_dir}/events.parquet")
    enriched = src.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "value", "tier"
    )
    tmp = tempfile.mkdtemp(prefix="enriched_stream_")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    run_available_now(enriched, out, cp)
    return spark.read.parquet(out)


@query(
    "store_time_travel",
    oracle="""
    SELECT 'v_00000001' AS version, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources
    FROM documents WHERE lang = 'en'
    UNION ALL
    SELECT 'v_00000002' AS version, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    """,
)
def store_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation + time travel on the versioned parquet store
    (sources/store.py): commit the English slice as v1, the full corpus
    as v2, then read v1 PINNED BY VERSION *after* v2 has replaced it as
    current, alongside the manifest-resolved current read. The oracle
    recomputes both snapshots from the source table, so a v2 write that
    leaked into v1's directory (or a manifest that failed to flip) would
    hash-mismatch. This is the engine's `VERSION AS OF`; the single-
    writer contract and GC retention discipline are documented in the
    store module."""
    import os

    from bigdatapipelne_spark.sources import store

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    root = os.path.join(tempfile.mkdtemp(prefix="ttravel_"), "docs_store")
    store.commit_version(docs.filter(F.col("lang") == "en"), root)
    store.commit_version(docs, root)
    # Fail loudly even under python -O (a bare assert would be stripped).
    if store.current_version(root) != "v_00000002":
        raise AssertionError(
            f"manifest flip failed: current={store.current_version(root)!r}, "
            "expected v_00000002"
        )
    v1 = store.read_version(spark, root, "v_00000001")
    v2 = store.read_current(spark, root)

    def summarize(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy().agg(
            F.lit(tag).alias("version"),
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        ).select("version", "n_docs", "n_sources")

    return summarize(v1, "v_00000001").unionByName(summarize(v2, "v_00000002"))


@query(
    "store_vacuum",
    oracle="""
    SELECT 'v_00000002' AS version, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    UNION ALL
    SELECT 'v_00000003' AS version, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources
    FROM documents WHERE lang <> 'en'
    """,
)
def store_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version retention on the versioned store (sources/store.py
    gc_versions — Delta's VACUUM discipline): commit three versions, GC
    with keep=2, then certify — in-query, failing loudly — that (a)
    exactly v1 was reclaimed, (b) a time-travel read of the reclaimed
    version now fails fast, (c) the manifest still points at v3, and (d)
    the RETAINED versions read back bit-identical to their pre-vacuum
    content (order-independent xxhash64 fingerprint captured before the
    GC). The emitted summaries of the retained versions are then
    hash-checked against the source-table oracle, so a vacuum that
    corrupted surviving data would also fail the driver row."""
    import os

    from bigdatapipelne_spark.sources import store

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    root = os.path.join(tempfile.mkdtemp(prefix="vacuum_"), "docs_store")
    store.commit_version(docs.filter(F.col("lang") == "en"), root)  # v1
    store.commit_version(docs, root)  # v2
    store.commit_version(docs.filter(F.col("lang") != "en"), root)  # v3

    def fingerprint(df: DataFrame) -> int:
        # order-independent content hash: XOR-fold of per-row xxhash64
        # (a SUM would overflow long under ANSI mode)
        return (
            df.agg(F.expr("bit_xor(xxhash64(doc_id, lang, source))")).first()[0]
            or 0
        )

    retained = ("v_00000002", "v_00000003")
    pre = {v: fingerprint(store.read_version(spark, root, v)) for v in retained}

    doomed = store.gc_versions(root, keep=2)
    if doomed != ["v_00000001"]:
        raise AssertionError(f"vacuum reclaimed {doomed}, expected [v_00000001]")
    try:
        store.read_version(spark, root, "v_00000001")
        raise AssertionError("reclaimed version v_00000001 is still readable")
    except FileNotFoundError:
        pass
    if store.current_version(root) != "v_00000003":
        raise AssertionError(
            f"manifest moved during vacuum: {store.current_version(root)!r}"
        )
    post = {v: fingerprint(store.read_version(spark, root, v)) for v in retained}
    if post != pre:
        raise AssertionError(
            f"retained versions changed across vacuum: pre={pre} post={post}"
        )

    def summarize(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy().agg(
            F.lit(tag).alias("version"),
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        ).select("version", "n_docs", "n_sources")

    return summarize(store.read_version(spark, root, "v_00000002"), "v_00000002").unionByName(
        summarize(store.read_current(spark, root), "v_00000003")
    )


@query(
    "bucketed_join_disk",
    oracle=f"""
    SELECT o.o_orderpriority,
           {OSUM('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-shuffle co-located fact-fact join FROM DISK, under the hash
    gate: orders and lineitem are written as bucketed tables (8 buckets
    on the order key, sources/io.py write_bucketed_table), re-read
    through the catalog, and joined — the query FAILS LOUDLY if the
    executed join plan contains any Exchange, so a regression in the
    bucket layout (not just in the values) breaks the driver row. This
    is the storage-layout lever for repeated 100 TB fact-fact joins; the
    only exchange in the whole query is the group-by after the join.
    Values must equal a plain join+aggregate oracle (DECIMAL-exact
    revenue)."""
    import os

    from bigdatapipelne_spark.sources.io import write_bucketed_table

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lineitem = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # Sweep PRIOR invocations' run-unique tables (catalog entries + their
    # mkdtemp data dirs). Cleanup can't happen at exit: the returned frame
    # lazily reads THIS run's tables until the driver materializes it —
    # so each entry reclaims whatever the previous entries leaked.
    import shutil

    for tbl in spark.catalog.listTables():
        if tbl.name.startswith(("bq_orders_b_", "bq_lineitem_b_")) and not tbl.isTemporary:
            loc = next(
                (
                    r.data_type
                    for r in spark.sql(f"DESCRIBE FORMATTED {tbl.name}").collect()
                    if r.col_name == "Location"
                ),
                None,
            )
            spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
            if loc and loc.startswith("file:"):
                # data dirs live under one mkdtemp parent per run
                shutil.rmtree(
                    os.path.dirname(loc.removeprefix("file:")), ignore_errors=True
                )

    tmp = tempfile.mkdtemp(prefix="bucketed_join_")
    # Table names carry the run-unique mkdtemp suffix: the session catalog
    # (and its warehouse) is shared, so fixed names would collide across
    # concurrent benches or a driver re-entry on one warehouse.
    run_id = os.path.basename(tmp).removeprefix("bucketed_join_")
    t_orders, t_lineitem = f"bq_orders_b_{run_id}", f"bq_lineitem_b_{run_id}"
    write_bucketed_table(
        spark, orders, t_orders, ["o_orderkey"], 8,
        os.path.join(tmp, "orders"),
    )
    write_bucketed_table(
        spark, lineitem, t_lineitem, ["l_orderkey"], 8,
        os.path.join(tmp, "lineitem"),
    )
    # The MERGE hint pins SortMergeJoin in THIS returned plan; with both
    # sides bucketed on the key, EnsureRequirements then needs no Exchange.
    o = spark.table(t_orders).hint("merge")
    li = spark.table(t_lineitem)
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    # Certify zero-shuffle on a FULLY-DETERMINED plan: under AQE the
    # pre-action executedPlan string is the initial AdaptiveSparkPlan and
    # the finally-executed plan may differ, so compile the assertion plan
    # with AQE off (restored immediately — the returned DataFrame is
    # re-planned at action time with the session's own confs; AQE only
    # re-optimizes at exchange boundaries, so a plan with no Exchange
    # cannot grow one).
    aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = li.join(o, li.l_orderkey == o.o_orderkey)._jdf.queryExecution(
        ).executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    if "Exchange" in plan or "SortMergeJoin" not in plan:
        raise AssertionError(
            "bucketed join must be a shuffle-free SortMergeJoin; got:\n" + plan
        )
    from bigdatapipelne_spark.operators.aggregate import exact_sum

    return joined.groupBy("o_orderpriority").agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "revenue",
            scale=4,
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "schema_evolution_disk",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           COUNT(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
             AS sum_chars
    FROM documents GROUP BY lang
    """,
)
def schema_evolution_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution under the hash gate: an old batch written WITHOUT
    the n_chars column and a new batch WITH it are read back together
    under mergeSchema — the crawler-era scenario where a feed adds a
    field mid-stream. Old rows must surface NULL for the added column
    (COUNT/SUM skip them) and no row may be dropped or duplicated; the
    oracle recomputes both facts from the source table. Exercises the
    same parquet footer-merge path a 100 TB lake hits when partitions
    disagree on schema."""
    import os

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tmp = tempfile.mkdtemp(prefix="schema_evo_")
    d_old, d_new = os.path.join(tmp, "b1"), os.path.join(tmp, "b2")
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(d_old)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(d_new)
    merged = spark.read.option("mergeSchema", "true").parquet(d_old, d_new)
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("n_chars").alias("n_with_chars"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@query(
    "compaction_disk",
    oracle=f"""
    SELECT COUNT(*) AS n_events,
           {OSUM('value')} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def compaction_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction under the hash gate: the events table is
    scattered into 16 micro-batch-sized files (the accretion pattern of
    any streaming sink), compacted by sources/io.py compact_parquet, and
    re-read — the query raises if the directory still holds more than
    the computed file budget, and the DECIMAL-exact aggregate certifies
    the rewrite lost/duplicated nothing. At 100 TB this is the
    maintenance job that keeps per-file open/footer overhead from
    dominating scans."""
    import glob as _glob
    import os

    from bigdatapipelne_spark.operators.aggregate import exact_sum
    from bigdatapipelne_spark.sources.io import compact_parquet

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    tmp = tempfile.mkdtemp(prefix="compaction_")
    path = os.path.join(tmp, "events_small")
    ev.repartition(16).write.parquet(path)
    n_before = len(_glob.glob(os.path.join(path, "part-*.parquet")))
    budget = compact_parquet(spark, path, target_file_bytes=512 * 1024 * 1024)
    n_after = len(_glob.glob(os.path.join(path, "part-*.parquet")))
    if not (n_after <= budget < n_before):
        raise AssertionError(
            f"compaction must shrink {n_before} files within budget {budget}; "
            f"directory has {n_after}"
        )
    return spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value", "sum_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


@query(
    "stream_versioned_sink_drain",
    oracle=f"""
    SELECT COUNT(*) AS n_events,
           {OSUM('value')} AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    """,
)
def stream_versioned_sink_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sink with reader-atomic snapshot visibility: three
    ordered micro-batches (staged files, maxFilesPerTrigger=1) each
    commit a NEW store version holding previous-snapshot UNION batch via
    foreachBatch — readers resolving the manifest between batches see a
    complete prefix of the stream, never a half-written directory (the
    exactly-once-VISIBLE discipline; the store module documents the
    single-writer contract). The query raises unless exactly three
    versions exist with strictly growing row counts; the final snapshot
    must hash-equal the whole table."""
    import os

    from bigdatapipelne_spark.operators.aggregate import exact_sum
    from bigdatapipelne_spark.sources import store
    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    # The store sink needs no event time, so only the fact columns are
    # staged (sidestepping the INT96-vs-int64 timestamp re-encoding a
    # Spark rewrite of the ts column would introduce for the sniffer).
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    tmp = tempfile.mkdtemp(prefix="vstream_")
    staging = os.path.join(tmp, "staging")
    stage_ordered_files(
        [ev.filter(F.col("event_id") % 3 == r) for r in range(3)], staging
    )
    root = os.path.join(tmp, "store")

    def commit_batch(batch_df: DataFrame, _batch_id: int) -> None:
        # the packaged OCC read-modify-write loop: each attempt rebuilds
        # previous-snapshot UNION batch against the fresh parent
        def build(parent):
            if parent is None:
                return batch_df
            return store.read_version(spark, root, parent).unionByName(batch_df)

        store.commit_with_retry(build, root)

    src = (
        spark.readStream.schema("event_id long, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    (
        src.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", os.path.join(tmp, "cp"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    versions = sorted(
        d for d in os.listdir(root) if d.startswith("v_") and
        os.path.isdir(os.path.join(root, d))
    )
    if len(versions) != 3:
        raise AssertionError(f"expected 3 committed versions, got {versions}")
    counts = [store.read_version(spark, root, v).count() for v in versions]
    if not (0 < counts[0] < counts[1] < counts[2]):
        raise AssertionError(f"version row counts must grow strictly: {counts}")
    return store.read_current(spark, root).agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_sum("value", "sum_value"),
        F.count_distinct("user_id").alias("n_users"),
    )


@query(
    "medallion_audit",
    oracle=f"""
    WITH stage AS ({_CARD_STAGE_SQL}),
    spec AS (
      SELECT DISTINCT bandeira, numero_cartao, exp, tipo_cartao, cor_cartao,
             tipo_transacao, cidade, latitude, longitude, estado
      FROM stage
    )
    SELECT CAST((SELECT COUNT(*) FROM events) + 1 AS BIGINT) AS raw_lines,
           CAST((SELECT COUNT(*) FROM stage) AS BIGINT) AS stage_rows,
           CAST((SELECT COUNT(*) FROM spec) AS BIGINT) AS spec_rows,
           CAST(1 AS BIGINT) AS dropped_bad_records
    """,
)
def medallion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch reconciliation audit across the medallion chain — the
    row-accounting a production pipeline alarms on (the reference's Glue
    job metrics, made explicit): raw landed lines (including the
    injected corrupt one), stage rows after the DROPMALFORMED scan, spec
    mart rows, and dropped = raw - stage COMPUTED from the real counts,
    not assumed. The oracle derives every figure independently from the
    source table (corrupt line -> exactly one drop; stage must equal the
    event count; spec must equal the distinct dimension-group count), so
    a scan that silently ate a good record, double-landed a file, or
    collapsed groups wrong fails the hash."""
    import os

    from bigdatapipelne_spark.plans.medallion import run_medallion
    from bigdatapipelne_spark.sources.io import write_json_partitioned

    raw = card_raw_from_events(t(spark, sf_dir, "events"))
    tmp = tempfile.mkdtemp(prefix="medallion_audit_")
    raw_path = os.path.join(tmp, "raw")
    write_json_partitioned(raw, raw_path, ["estado"])
    with open(os.path.join(raw_path, "estado=SP", "corrupt.json"), "w") as f:
        f.write('{"valor": "not parseable as the schema says"\n')
    stage_path, spec_path = os.path.join(tmp, "stage"), os.path.join(tmp, "spec")
    run_medallion(spark, raw_path, stage_path, spec_path)

    raw_lines = spark.read.text(raw_path).count()
    stage_rows = spark.read.parquet(stage_path).count()
    spec_rows = spark.read.parquet(spec_path).count()
    return spark.createDataFrame(
        [(raw_lines, stage_rows, spec_rows, raw_lines - stage_rows)],
        "raw_lines long, stage_rows long, spec_rows long, dropped_bad_records long",
    )


@query(
    "purchase_view_full_outer_drain",
    oracle="""
    WITH p AS (SELECT user_id, event_id AS purchase_id, ts AS pts
               FROM events WHERE event_type = 'purchase'),
    v AS (SELECT user_id, event_id AS view_id, ts AS vts
          FROM events WHERE event_type = 'view'),
    wm AS (SELECT least(
             (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'purchase'),
             (SELECT epoch_ms(max(ts)) FROM events WHERE event_type = 'view')
           ) - 10000 AS wm_ms)
    SELECT user_id,
           COALESCE(purchase_id, -1) AS purchase_id,
           COALESCE(pts, TIMESTAMP '1900-01-01') AS pts,
           COALESCE(view_id, -1) AS view_id,
           COALESCE(vts, TIMESTAMP '1900-01-01') AS vts
    FROM (
      SELECT p.user_id, p.purchase_id, p.pts, v.view_id, v.vts
      FROM p JOIN v ON p.user_id = v.user_id
         AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL '6 hours'
      UNION ALL
      SELECT p.user_id, p.purchase_id, p.pts, NULL, NULL
      FROM p, wm
      WHERE epoch_ms(p.pts) < wm_ms
        AND NOT EXISTS (SELECT 1 FROM v
                        WHERE v.user_id = p.user_id
                          AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL '6 hours')
      UNION ALL
      SELECT v.user_id, NULL, NULL, v.view_id, v.vts
      FROM v, wm
      WHERE epoch_ms(v.vts + INTERVAL '6 hours') < wm_ms
        AND NOT EXISTS (SELECT 1 FROM p
                        WHERE p.user_id = v.user_id
                          AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL '6 hours')
    )
    """,
)
def purchase_view_full_outer_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-OUTER stream-stream join, drained: the left-outer drain's
    emission rules plus the symmetric right-side rule — an unmatched
    view emits null-extended only when the global watermark strictly
    passes the LAST purchase time that could still match it
    (vts + lookback, since matches need pts <= vts + 6h and arriving
    purchases have pts >= watermark). The oracle reproduces the inner
    part and BOTH eviction rules, completing the hash-checked
    stream-stream join matrix (inner / left-outer / full-outer)."""
    import os

    from bigdatapipelne_spark.streaming.fraud import (
        read_events_parquet_stream,
        run_available_now,
    )
    from bigdatapipelne_spark.streaming.joins import (
        correlate_streams,
        size_state_partitions,
    )

    def side(event_type: str, cols: dict[str, str]) -> DataFrame:
        s = read_events_parquet_stream(spark, f"{sf_dir}/events.parquet")
        s = s.filter(F.col("event_type") == event_type)
        return s.select("user_id", *[F.col(c).alias(a) for c, a in cols.items()])

    purchases = side("purchase", {"event_id": "purchase_id", "ts": "pts"})
    views = side("view", {"event_id": "view_id", "ts": "vts"})
    joined = correlate_streams(
        purchases, views, key="user_id", left_time="pts", right_time="vts",
        lookback="6 hours", how="full_outer",
    )
    tmp = tempfile.mkdtemp(prefix="ss_full_outer_")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    run_available_now(
        joined, out, cp, state_partitions=size_state_partitions(n_events)
    )
    # Null-extended sides are COALESCEd to sentinels (-1 / 1900-01-01) on
    # BOTH engines: the hash compare sorts rows by every column, and a
    # nullable timestamp in the first-sorting column breaks that sort (the
    # verify-recipe gotcha); sentinels cannot collide with real data.
    sentinel_ts = F.lit("1900-01-01 00:00:00").cast("timestamp")
    return spark.read.parquet(out).select(
        "user_id",
        F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
        F.coalesce(F.col("pts"), sentinel_ts).alias("pts"),
        F.coalesce("view_id", F.lit(-1)).alias("view_id"),
        F.coalesce(F.col("vts"), sentinel_ts).alias("vts"),
    )


@query(
    "stream_restart_resume_drain",
    oracle="""
    SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
    FROM events
    """,
)
def stream_restart_resume_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once across a stream RESTART, under the hash gate: the
    first drain sees only two of three staged files and stops; the third
    file lands; a SECOND drain starts from the SAME checkpoint and must
    process only the new file. The final sink must equal the whole table
    exactly — a re-processed file would duplicate rows and flip the
    hash, a lost offset would drop them. This is the W5/W6 checkpoint
    bookmark (tests/test_streaming.py pins it locally) promoted to
    driver-gated evidence."""
    import os

    from bigdatapipelne_spark.streaming.scd import stage_ordered_files

    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    parts = [ev.filter(F.col("event_id") % 3 == r) for r in range(3)]
    tmp = tempfile.mkdtemp(prefix="restart_")
    staging = os.path.join(tmp, "staging")
    out, cp = os.path.join(tmp, "out"), os.path.join(tmp, "cp")

    def drain() -> None:
        (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(staging)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    stage_ordered_files(parts[:2], staging)
    drain()
    n_first = spark.read.parquet(out).count()
    # The third file lands with the NEXT mtime off the same staged base
    # epoch (stage_one_more_file); the resumed drain must pick up exactly
    # this one.
    from bigdatapipelne_spark.streaming.scd import stage_one_more_file

    stage_one_more_file(parts[2], staging)
    drain()
    final = spark.read.parquet(out)
    n_final = final.count()
    if not (0 < n_first < n_final):
        raise AssertionError(
            f"restart must only append the new file: first={n_first}, final={n_final}"
        )
    return final.select("event_id", "user_id", "value")
