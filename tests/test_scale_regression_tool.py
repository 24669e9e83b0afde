"""tools/scale_regression.py gate logic: baseline parsing (both the
SCALE_r{N} operator-sweep layout and the tool's own output layout) and
the flagging rule max(1.5 x baseline + 1.0, abs_threshold)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from scale_regression import baseline_ratios  # noqa: E402


def test_parses_scale_rn_layout(tmp_path):
    p = tmp_path / "scale.json"
    json.dump({"operators": {"operators": {
        "a": {"ratio": 2.5, "sf1_sec": 1.0},
        "b": {"ratio": 9.0},
        "note": "not-a-row",
    }}}, open(p, "w"))
    b = baseline_ratios(str(p))
    assert b == {"a": 2.5, "b": 9.0}


def test_parses_own_output_layout(tmp_path):
    p = tmp_path / "own.json"
    json.dump({"metric": "scale_regression",
               "queries": {"q1": {"ratio": 3.0},
                           "q2": {"ratio": None}}}, open(p, "w"))
    assert baseline_ratios(str(p)) == {"q1": 3.0}


def test_flag_rule_matches_committed_artifact():
    """The committed SCALE_r12.json must be self-consistent: every row's
    limit equals max(1.5*baseline + 1.0, 15) (or 15 with no baseline),
    and `flagged` lists exactly the rows whose ratio exceeds it."""
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_r12.json")
    d = json.load(open(art))
    flagged = []
    for k, v in d["queries"].items():
        b = v["baseline_ratio"]
        limit = max(1.5 * b + 1.0, 15.0) if b is not None else 15.0
        assert v["limit"] == round(limit, 2), k
        if v["ratio"] > limit:
            flagged.append(k)
    assert sorted(flagged) == sorted(d["flagged"])
