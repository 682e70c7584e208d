"""Deterministic card-transaction generator (SURVEY.md §2.6 G1-G5,
FIXTURES.md A1) — the reference's Faker/Nominatim generator re-expressed as
seeded, offline, distributed Spark expressions.

Reference semantics reproduced (generator_app/app.py):

- G1 CPF check digits: the mod-11 weighted-sum algorithm over 9 base digits
  (app.py:48-53) — implemented exactly, as Catalyst integer arithmetic.
- G2 weighted categorical sampling: tipo_cartao 5/15/20/25/35 over
  unlimited/black/platinum/gold/standard, cor_cartao likewise,
  tipo_transacao credito 65 / debito 35 (app.py:11-30,70-72).
- G3 geo sampling: a fixed BR (lat, lng, cidade, estado) table replaces the
  live Nominatim reverse geocode (offline determinism; FIXTURES.md).
  lat/lng are emitted as *strings* (app.py:73-78).
- G4/G5 ISO timestamps and transaction ids: derived from the row index, not
  wall clock, so every run of ``generate_transactions(spark, n, seed)`` is
  bit-identical.

Randomness is hash-derived: stream j of row i = md5(seed:j:i) interpreted
as an integer. No RNG state, no driver-side loops — ``spark.range(n)``
scales the generation to any row count across any number of executors.

``valor`` follows the reference's Uniform[1, 9999] 2-dp domain
(app.py:65), so ~half the generated transactions clear the 5000 fraud
threshold — the same discriminating shape the live pipeline sees.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TIPO_CARTAO = ("unlimited", "black", "platinum", "gold", "standard")
TIPO_CARTAO_W = (5, 15, 20, 25, 35)
COR_CARTAO = ("preto", "prata", "amarelo", "azul", "verde")
COR_CARTAO_W = (5, 15, 20, 25, 35)
TIPO_TRANSACAO = ("credito", "debito")
TIPO_TRANSACAO_W = (65, 35)
BANDEIRAS = ("visa", "mastercard", "elo", "amex", "hipercard")

# Fixed BR city table (lat/lng as strings — generator_app/app.py:73-78).
BR_CITIES = (
    ("-23.5505", "-46.6333", "Sao Paulo", "SP"),
    ("-22.9068", "-43.1729", "Rio de Janeiro", "RJ"),
    ("-19.9167", "-43.9345", "Belo Horizonte", "MG"),
    ("-30.0346", "-51.2177", "Porto Alegre", "RS"),
    ("-25.4284", "-49.2733", "Curitiba", "PR"),
    ("-12.9777", "-38.5016", "Salvador", "BA"),
    ("-3.7319", "-38.5267", "Fortaleza", "CE"),
    ("-15.7939", "-47.8828", "Brasilia", "DF"),
)


def _hstream(seed: int, stream: str, i: Column, bits: int = 8) -> Column:
    """Deterministic pseudo-random integer in [0, 16^bits) for row ``i``:
    the first ``bits`` hex chars of md5('<seed>:<stream>:<i>')."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(stream), i.cast("string")))
    return F.conv(F.substring(h, 1, bits), 16, 10).cast("long")


def _weighted_pick(
    options: tuple[str, ...], weights: tuple[int, ...], rnd_pct: Column
) -> Column:
    """G2: categorical sample by cumulative weights over rnd_pct in
    [0, 100)."""
    expr = F.lit(options[-1])
    acc = 0
    branches = []
    for opt, w in zip(options, weights):
        acc += w
        branches.append((acc, opt))
    # Build from the last branch backwards: when rnd < cum_i -> options[i].
    expr = F.lit(options[-1])
    for acc_w, opt in reversed(branches[:-1]):
        expr = F.when(rnd_pct < acc_w, F.lit(opt)).otherwise(expr)
    return expr


def cpf_column(seed: int, i: Column) -> Column:
    """G1: 11-digit CPF with valid mod-11 check digits, derived from nine
    hash-derived base digits (generator_app/app.py:48-53 semantics:
    dv1 = 11 - (sum(d[k] * (10-k)) % 11), >9 -> 0; dv2 likewise with
    weights 11..2 over the ten digits)."""
    digits = [(_hstream(seed, f"cpf{k}", i) % 10).cast("int") for k in range(9)]
    s1 = None
    for k, d in enumerate(digits):
        term = d * (10 - k)
        s1 = term if s1 is None else s1 + term
    dv1 = F.lit(11) - (s1 % 11)
    dv1 = F.when(dv1 > 9, F.lit(0)).otherwise(dv1)
    s2 = None
    for k, d in enumerate(digits + [dv1]):
        term = d * (11 - k)
        s2 = term if s2 is None else s2 + term
    dv2 = F.lit(11) - (s2 % 11)
    dv2 = F.when(dv2 > 9, F.lit(0)).otherwise(dv2)
    return F.concat(*[d.cast("string") for d in digits], dv1.cast("string"), dv2.cast("string"))


def generate_transactions(
    spark: SparkSession, n: int, seed: int = 42, n_cards: int | None = None
) -> DataFrame:
    """Deterministic card-transaction frame in the FIXTURES.md A1 shape
    (nested ``localizacao`` struct, string lat/lng, ISO event time,
    top-level ``estado`` partition copy). Cards are reused
    (``n_cards`` ≈ n/20 by default) so per-card windows hold >1 txn."""
    if n_cards is None:
        n_cards = max(n // 20, 1)
    df = spark.range(n)
    i = F.col("id")

    card_idx = _hstream(seed, "card", i) % n_cards
    city_idx = (_hstream(seed, "city", i) % len(BR_CITIES)).cast("int")
    lat = F.element_at(F.array(*[F.lit(c[0]) for c in BR_CITIES]), city_idx + 1)
    lng = F.element_at(F.array(*[F.lit(c[1]) for c in BR_CITIES]), city_idx + 1)
    cidade = F.element_at(F.array(*[F.lit(c[2]) for c in BR_CITIES]), city_idx + 1)
    estado = F.element_at(F.array(*[F.lit(c[3]) for c in BR_CITIES]), city_idx + 1)

    # valor ~ Uniform[1, 9999], 2 dp (app.py:65): integer cents, exact.
    cents = _hstream(seed, "valor", i, bits=10) % (9999_00 - 1_00 + 1) + 1_00
    valor = (cents.cast("decimal(18,2)") / F.lit(100).cast("decimal(18,2)")).cast(
        "double"
    )

    # Event time: one txn per second from a fixed origin (G4, deterministic
    # stand-in for wall clock), ISO-8601 string like the reference emits.
    ts = F.timestamp_seconds(F.lit(1704067200) + i)  # 2024-01-01 UTC origin

    return df.select(
        F.concat(F.lit("cliente "), card_idx.cast("string")).alias("nome"),
        cpf_column(seed, i).alias("cpf"),
        valor.alias("valor"),
        F.element_at(
            F.array(*[F.lit(b) for b in BANDEIRAS]),
            (_hstream(seed, "band", i) % len(BANDEIRAS)).cast("int") + 1,
        ).alias("bandeira"),
        F.lpad(card_idx.cast("string"), 16, "4").alias("numero_cartao"),
        F.lpad((_hstream(seed, "cvv", i) % 1000).cast("string"), 3, "0").alias("cvv"),
        F.concat(
            F.lpad(((_hstream(seed, "expm", i) % 12) + 1).cast("string"), 2, "0"),
            F.lit("/"),
            ((_hstream(seed, "expy", i) % 5) + 25).cast("string"),
        ).alias("exp"),
        _weighted_pick(
            TIPO_CARTAO, TIPO_CARTAO_W, _hstream(seed, "tipo", i) % 100
        ).alias("tipo_cartao"),
        _weighted_pick(
            COR_CARTAO, COR_CARTAO_W, _hstream(seed, "cor", i) % 100
        ).alias("cor_cartao"),
        _weighted_pick(
            TIPO_TRANSACAO, TIPO_TRANSACAO_W, _hstream(seed, "tt", i) % 100
        ).alias("tipo_transacao"),
        F.struct(
            lat.alias("lat"), lng.alias("lng"), cidade.alias("cidade"),
            estado.alias("estado"),
        ).alias("localizacao"),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("horario_transacao"),
        estado.alias("estado"),
        F.concat(F.lit("txn-"), F.lpad(i.cast("string"), 12, "0")).alias(
            "transaction_id"
        ),
    )
