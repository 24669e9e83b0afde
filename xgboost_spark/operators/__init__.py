"""Data-pipeline operators: dedup, similarity, relational extras,
text statistics, sampling/packing, sketches, scans."""

from xgboost_spark.operators import (  # noqa: F401
    binning,
    dedup,
    histogram,
    multimodal,
    relational,
    sampling,
    scan,
    similarity,
    sketch,
    textstats,
)
