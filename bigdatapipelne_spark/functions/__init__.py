"""Scalar/column function library (JVM-side expression builders).

Everything here returns Catalyst ``Column`` expressions built from
``pyspark.sql.functions`` — no Python UDFs — so whole-stage codegen and
vectorization apply on the 100 TB hot path.
"""

from bigdatapipelne_spark.functions.text import (
    en_stopword_ratio,
    fingerprint,
    normalize_text,
    shingles,
    tokens,
)
from bigdatapipelne_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "tokens",
    "shingles",
    "normalize_text",
    "fingerprint",
    "en_stopword_ratio",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
