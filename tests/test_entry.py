"""Replicates the driver's correctness gate locally: run every
queries() entry and its oracle_sql() on the same parquet via DuckDB,
compare row count + sorted values (order-insensitive, like the hash)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}")
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    assert list(s.columns) == list(d.columns), f"{name}: columns {list(s.columns)} vs {list(d.columns)}"
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
            np.testing.assert_allclose(
                sv.astype(float), dv.astype(float), rtol=0, atol=1e-9,
                err_msg=f"{name}: column {c} differs")
        else:
            assert (sv == dv).all(), f"{name}: column {c} differs: {sv[:5]} vs {dv[:5]}"


ORACLE_KEYS = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, sf_dir, duck, name):
    q = E.queries()[name]
    sql = E.oracle_sql()[name]
    spark_pdf = q(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(sql).fetchdf()
    _compare(spark_pdf, duck_pdf, name)


ROWS_ONLY = sorted(set(E.queries()) - set(E.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    out = E.queries()[name](spark, sf_dir)
    pdf = out.toPandas()
    assert len(pdf) > 0
    assert len(pdf.columns) > 0
    # rows-only entries self-validate: every inv_* column is an in-row
    # invariant the entry promises (r9-verdict hardening) and must hold
    # on every row; train_expectile's monotone_violations counts cross-
    # alpha crossings and must be zero
    inv_cols = [c for c in pdf.columns if c.startswith("inv_")]
    assert inv_cols or name not in (
        "image_pipeline", "stream_score", "train_stream"), \
        f"{name}: expected in-row invariant columns"
    for c in inv_cols:
        assert pdf[c].all(), f"{name}: invariant {c} violated:\n{pdf}"
    if "monotone_violations" in pdf.columns:
        assert (pdf["monotone_violations"] == 0).all()


def test_entry_smoke(spark):
    df = E.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
