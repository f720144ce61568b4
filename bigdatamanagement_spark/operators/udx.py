"""User-defined function surfaces: scalar Pandas UDF, grouped-aggregate
Pandas UDAF, and a Python UDTF.

The reference has NO custom functions (SURVEY §2.11) and the engine's
core policy keeps Python out of the hot path (every contract query is
JVM-side). These exist to complete the extension API surface a Spark
user expects — each is the Arrow-batched form (never row-at-a-time
``udf()``), and each has an equivalence test against a JVM-side plan in
tests/test_udx.py so the boundary-crossing semantics stay pinned.

All builders are lazy (``pandas_udf``/``udtf`` decorators parse their
DDL return types against the ACTIVE session, so decorating at module
import would require a SparkSession before the engine starts one).

Scale notes (100 TB): a Pandas UDF ships columns through Arrow in
~10k-row batches — fine for genuinely-Python logic (models, codecs),
10-100x a row-UDF, still behind built-ins (no codegen fusion, no
pushdown through it). The UDTF's lateral-join shape parallelizes per
input row like explode; state lives per-partition in the class
instance.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame


@lru_cache(maxsize=1)
def log1p_udf():
    """Scalar Pandas UDF: vectorized numpy transform per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log1p_value(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.log1p(v.to_numpy()))

    return log1p_value


@lru_cache(maxsize=1)
def weighted_mean_udaf():
    """Grouped-aggregate Pandas UDAF: Σ(v·w)/Σ(w) per group (NaN-safe).

    Used as ``df.groupBy(k).agg(weighted_mean(v, w))`` — Spark ships
    each group's columns as one Arrow batch; the return is a scalar per
    group. At scale prefer sum(v*w)/sum(w) in JVM expressions when
    expressible — the UDAF form is for aggregations that genuinely need
    Python (e.g. a model eval per group)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:  # type: ignore[misc]
        import numpy as np

        vv, ww = v.to_numpy(dtype=float), w.to_numpy(dtype=float)
        mask = ~(pd.isna(vv) | pd.isna(ww))
        tot = float(np.sum(ww[mask]))
        return float(np.sum(vv[mask] * ww[mask]) / tot) if tot else float("nan")

    return weighted_mean


@lru_cache(maxsize=1)
def ngrams_udtf():
    """Python UDTF: one (position, n-gram) row per sliding window of the
    input text's whitespace tokens. Table-function twin of the JVM
    raw_shingles_from_tokens (operators/text.py) — equality is asserted
    in tests, documenting that the UDTF path is a semantic drop-in (at
    ~Python speed) for the expression path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, gram string")
    class NGramsUDTF:
        def eval(self, text: str, n: int = 3):  # noqa: ANN001
            if text is None:
                return
            toks = text.strip().lower().split()
            for i in range(max(len(toks) - n + 1, 0)):
                yield i, " ".join(toks[i : i + n])

    return NGramsUDTF


def ngram_rows(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Lateral-join the UDTF over a DataFrame: one output row per gram."""
    df.createOrReplaceTempView("__udtf_in")
    spark = df.sparkSession
    spark.udtf.register("ngrams_udtf", ngrams_udtf())
    return spark.sql(
        f"""
        SELECT t.*, g.pos, g.gram
        FROM __udtf_in t,
        LATERAL ngrams_udtf({text_col}, {int(n)}) g
        """
    )
