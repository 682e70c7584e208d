"""Pandas UDAF surface (Arrow GROUPED_AGG): custom aggregates for logic the
builtin aggregate library can't express.

Same stance as the UDTF surface (functions/udtfs.py): builtins first —
Spark's own ``percentile``/``median`` cover this exact computation, and the
hot path should use them. The UDAF here exists to certify the extension
path end-to-end (``pandas_udf`` GROUPED_AGG -> ``groupBy().agg()`` ->
hash-checked against the DuckDB oracle): when a user needs an aggregate
Spark lacks (a bespoke robust statistic, a domain-specific sketch), this
is the shape it takes — Arrow-batched per group, partial aggregation NOT
available (GROUPED_AGG ships each group's values to one worker), so at
100 TB the group cardinality must be high and group size bounded, or the
builtin-expressible form must be found.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_agg(v: pd.Series) -> float:
    """Exact median of the group's values. numpy's even-count midpoint
    ((a + b) * 0.5) performs the same double operation DuckDB's
    ``median`` does, so results hash-match the oracle bit-for-bit."""
    if len(v) == 0:
        return None
    return float(np.median(v.to_numpy(dtype="float64")))
