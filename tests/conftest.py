import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from xgboost_spark.session import get_session
    s = get_session("xgboost_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def reg_data():
    """Synthetic regression set with missing values."""
    rng = np.random.default_rng(7)
    n, f = 3000, 5
    X = rng.normal(size=(n, f))
    X[rng.random((n, f)) < 0.12] = np.nan
    y = (2.5 * np.nan_to_num(X[:, 0]) + np.where(np.isnan(X[:, 1]), 1.5, X[:, 1] ** 2)
         - np.nan_to_num(X[:, 2]) + rng.normal(0, 0.1, n))
    return X, y


@pytest.fixture(scope="session")
def reg_df(spark, reg_data):
    X, y = reg_data
    pdf = pd.DataFrame(X, columns=[f"c{i}" for i in range(X.shape[1])])
    pdf["label"] = y
    return spark.createDataFrame(pdf)
