"""Quantization: raw feature values -> histogram bin indices.

The reference replaces each float with its bin index against the global
cuts to form `GHistIndexMatrix` (`src/data/gradient_index.h:43,62-136`,
`SearchBin` `src/common/hist_util.h:122`).  Here the quantized matrix is
a DataFrame with one int16 column per feature (missing = -1), produced
either by Catalyst expressions (small bin counts — stays in whole-stage
codegen) or by an Arrow-batched `mapInPandas` using `np.searchsorted`
over broadcast cuts (the trainer path; one pass for all features).

Bin semantics: ``bin(x) = #{cuts < x}`` — bin i covers
``(cuts[i-1], cuts[i]]`` and the last cut is bumped above the max, so
every in-range value lands in ``[0, n_cuts)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xgboost_spark.core import MISSING_BIN, bin_values


def bin_expr(col: str, cuts: np.ndarray):
    """Catalyst expression form: bin = count of cuts strictly below x.

    Codegen-friendly for small cut counts; used by the oracle queries.
    """
    arr = F.array(*[F.lit(float(c)) for c in cuts[:-1]])  # last cut = upper bound
    x = F.col(col)
    n = F.size(F.filter(arr, lambda c: c < x))
    return F.when(x.isNull(), F.lit(int(MISSING_BIN))).otherwise(n).cast("smallint")


def quantize_expr(df: DataFrame, cols: list[str], cuts: list[np.ndarray],
                  out_prefix: str = "b") -> DataFrame:
    outs = [bin_expr(c, cuts[i]).alias(f"{out_prefix}{i}") for i, c in enumerate(cols)]
    return df.select(*df.columns, *outs)


def quantize_pandas(df: DataFrame, cols: list[str], cuts: list[np.ndarray],
                    keep: list[str] | None = None, out_prefix: str = "b") -> DataFrame:
    """Trainer path: one Arrow-batched pass binning all features.

    ``np.searchsorted(cuts, x, 'left')`` == #{cuts < x} for the same cut
    array, so the two paths agree bit-for-bit.
    """
    keep = keep or []
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast([np.asarray(c) for c in cuts])
    fields = ", ".join(
        [f"{out_prefix}{i} smallint" for i in range(len(cols))]
        + [f"{k} {dict(df.dtypes)[k]}" for k in keep]
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cuts_l = bc.value
        for pdf in it:
            out = {}
            for i, c in enumerate(cols):
                x = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
                out[f"{out_prefix}{i}"] = bin_values(x, cuts_l[i])
            for k in keep:
                out[k] = pdf[k]
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, schema=fields)
