"""UBJSON codec (ubjson.org spec; reference model I/O surface
`include/xgboost/c_api.h:1353-1389`)."""

import json
import struct

import numpy as np
import pytest

from xgboost_spark.sources import ubjson


def test_scalar_roundtrip():
    for v in [0, 1, -1, 255, -128, 32767, 2**31 - 1, 2**40, -2**40,
              0.5, -1.25, "hello", "", True, False, None]:
        assert ubjson.loads(ubjson.dumps(v)) == v


def test_nested_roundtrip():
    doc = {"learner": {"attributes": {}, "trees": [
        {"split_conditions": [0.5, -0.25, 1e300], "ids": [1, 2, 3],
         "flags": [True, False], "name": "t0", "none": None}]},
        "version": [3, 0, 2]}
    assert ubjson.loads(ubjson.dumps(doc)) == doc


def test_typed_and_counted_containers():
    """The reference writes numeric arrays as strongly-typed counted
    containers: [ $ <type> # <count> <payload...> ] — hand-crafted
    bytes, not produced by our writer."""
    # [$d#i3 <3 float32>] -> [1.5, 2.5, -3.5]
    buf = b"[$d#i" + struct.pack("b", 3) + struct.pack(">fff", 1.5, 2.5, -3.5)
    assert ubjson.loads(buf) == [1.5, 2.5, -3.5]
    # [$l#U2 <2 int32>]
    buf = b"[$l#U" + struct.pack("B", 2) + struct.pack(">ii", 7, -9)
    assert ubjson.loads(buf) == [7, -9]
    # counted but untyped: [#i2 i5 SU3abc]
    buf = b"[#i" + struct.pack("b", 2) + b"i" + struct.pack("b", 5) \
        + b"SU" + struct.pack("B", 3) + b"abc"
    assert ubjson.loads(buf) == [5, "abc"]
    # counted object with typed values: {$D#U1 <key> <float64>}
    buf = b"{$D#U" + struct.pack("B", 1) + b"U" + struct.pack("B", 2) \
        + b"pi" + struct.pack(">d", 3.25)
    assert ubjson.loads(buf) == {"pi": 3.25}
    # no-op markers are skipped
    buf = b"[Ni" + struct.pack("b", 1) + b"Ni" + struct.pack("b", 2) + b"N]"
    assert ubjson.loads(buf) == [1, 2]
    # high-precision number
    buf = b"HU" + struct.pack("B", 4) + b"1e-3"
    assert ubjson.loads(buf) == pytest.approx(1e-3)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _json_scalars = st.one_of(
        st.none(), st.booleans(),
        st.integers(min_value=-2**63, max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=40))
    _json_docs = st.recursive(
        _json_scalars,
        lambda child: st.one_of(
            st.lists(child, max_size=6),
            st.dictionaries(st.text(max_size=10), child, max_size=6)),
        max_leaves=25)

    @settings(max_examples=300, deadline=None)
    @given(_json_docs)
    def test_ubjson_roundtrip_property(doc):
        assert ubjson.loads(ubjson.dumps(doc)) == doc
except ImportError:      # pragma: no cover
    pass


def test_model_ubj_save_load(spark, reg_df):
    from xgboost_spark.config import TrainParams
    from xgboost_spark.plans.booster import SparkBooster
    from xgboost_spark.plans.model import GBDTModel
    import tempfile, os
    fc = [f"c{i}" for i in range(5)]
    m = SparkBooster(TrainParams(num_boost_round=3, max_depth=3,
                                 max_bin=16, seed=9)).fit(
        reg_df, feature_cols=fc)
    with tempfile.TemporaryDirectory() as d:
        pj, pu = os.path.join(d, "m.json"), os.path.join(d, "m.ubj")
        m.save(pj)
        m.save(pu)
        # binary file is valid UBJSON and decodes to the SAME document
        with open(pu, "rb") as f:
            assert ubjson.loads(f.read()) == json.loads(m.to_json())
        mj, mu = GBDTModel.load(pj), GBDTModel.load(pu)
        sample = reg_df.limit(200)
        a = mj.transform(sample, feature_cols=fc).toPandas()["prediction"]
        b = mu.transform(sample, feature_cols=fc).toPandas()["prediction"]
        assert np.allclose(np.sort(a), np.sort(b), rtol=0)
