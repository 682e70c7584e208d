"""Generator parity (G1-G5): valid CPF check digits, weighted categorical
distributions, determinism, and the end-to-end fit with the medallion
pipeline and the fraud rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatapipelne_spark.plans.medallion import spec_transform, stage_transform
from bigdatapipelne_spark.sources.generator import (
    TIPO_CARTAO,
    generate_transactions,
)
from bigdatapipelne_spark.streaming.fraud import fraud_alerts


def _cpf_is_valid(cpf: str) -> bool:
    d = [int(c) for c in cpf]
    dv1 = 11 - sum(d[k] * (10 - k) for k in range(9)) % 11
    dv1 = 0 if dv1 > 9 else dv1
    dv2 = 11 - sum(x * (11 - k) for k, x in enumerate(d[:9] + [dv1])) % 11
    dv2 = 0 if dv2 > 9 else dv2
    return d[9] == dv1 and d[10] == dv2


def test_cpf_check_digits_valid(spark):
    rows = generate_transactions(spark, 200).select("cpf").collect()
    assert all(len(r.cpf) == 11 for r in rows)
    assert all(_cpf_is_valid(r.cpf) for r in rows)


def test_weighted_distribution_and_domain(spark):
    df = generate_transactions(spark, 5000).cache()
    try:
        tipos = dict(
            df.groupBy("tipo_cartao").count().rdd.map(lambda r: (r[0], r[1])).collect()
        )
        assert set(tipos) == set(TIPO_CARTAO)
        # 35%-weight standard must dominate 5%-weight unlimited decisively.
        assert tipos["standard"] > 3 * tipos["unlimited"]

        tt = dict(df.groupBy("tipo_transacao").count().collect())
        assert tt["credito"] > 1.5 * tt["debito"]  # 65/35 split

        lo, hi = df.agg(F.min("valor"), F.max("valor")).first()
        assert 1.0 <= lo and hi <= 9999.0
    finally:
        df.unpersist()


def test_generator_is_deterministic_and_reuses_cards(spark):
    a = generate_transactions(spark, 300, seed=7).collect()
    b = generate_transactions(spark, 300, seed=7).collect()
    assert a == b
    c = generate_transactions(spark, 300, seed=8).collect()
    assert a != c
    n_cards = len({r.numero_cartao for r in a})
    assert 1 < n_cards < 300  # reuse -> per-card windows hold >1 txn


def test_generated_frame_feeds_medallion_and_fraud(spark):
    raw = generate_transactions(spark, 2000)
    stage = stage_transform(raw)
    assert stage.select("latitude").schema[0].dataType.simpleString() == "double"
    spec = spec_transform(stage)
    assert spec.count() > 0

    # The fraud rule discriminates on this domain: valor ~ U[1,9999] vs the
    # reference's >5000 threshold (flink_app/app.py:80).
    events = stage.select(
        F.col("numero_cartao").alias("user_id"),
        F.to_timestamp("horario_transacao").alias("ts"),
        F.col("valor").alias("value"),
    )
    alerts = fraud_alerts(events, threshold=5000.0)
    n_alerts = alerts.count()
    assert 0 < n_alerts < 2000
