"""Property-based differential fuzz for the round-6 pure lanes — random
inputs through BOTH the repo function and the actual reference code
(loaded via the same module fixtures as the per-lane suites)."""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/packages"),
    reason="reference tree not available",
)

# reuse the module-loading fixtures (they cache in sys.modules)
from tests.test_anomaly_detector_parity import ref as anomaly_ref  # noqa
from tests.test_geospatial import ref as geo_ref  # noqa
from tests.test_hidden_content import ref as hidden_ref  # noqa


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=5000))
def test_fuzz_entropy(hidden_ref, data):
    from arkhammirror_spark.operators.hidden_content import (
        entropy_regions, shannon_entropy,
    )

    _, hidden = hidden_ref
    det = hidden.HiddenContentDetector()
    assert shannon_entropy(data) == pytest.approx(
        det.calculate_entropy(data), rel=1e-12, abs=1e-12
    )
    exp = det.analyze_entropy_regions(data)
    got = entropy_regions(data)
    assert [(g[0], g[1], g[3], g[4]) for g in got] == [
        (e.start_offset, e.end_offset, e.is_anomalous, e.description)
        for e in exp
    ]


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=0, max_value=20, allow_nan=False),
    st.floats(min_value=0.1, max_value=5, allow_nan=False),
)
def test_fuzz_severity_ladder(anomaly_ref, z, t):
    _, det_mod = anomaly_ref
    det = det_mod.AnomalyDetector()
    exp = det._calculate_severity(z, t).value
    if z >= 2 * t:
        got = "critical"
    elif z >= 1.5 * t:
        got = "high"
    elif z >= t:
        got = "medium"
    else:
        got = "low"
    assert got == exp


@settings(max_examples=150, deadline=None)
@given(
    st.floats(min_value=-90, max_value=90, allow_nan=False),
    st.floats(min_value=-180, max_value=180, allow_nan=False),
    st.floats(min_value=-90, max_value=90, allow_nan=False),
    st.floats(min_value=-180, max_value=180, allow_nan=False),
)
def test_fuzz_haversine(geo_ref, lat1, lng1, lat2, lng2):
    from arkhammirror_spark.operators.geospatial import haversine_py

    _, geo = geo_ref
    eng = geo.GeoGraphEngine()
    assert haversine_py(lat1, lng1, lat2, lng2) == pytest.approx(
        eng.calculate_distance(lat1, lng1, lat2, lng2),
        rel=1e-12, abs=1e-9,
    )


_COORD_TEXT = st.one_of(
    st.tuples(
        st.floats(min_value=-95, max_value=95, allow_nan=False),
        st.floats(min_value=-190, max_value=190, allow_nan=False),
    ).map(lambda p: f"somewhere ({p[0]:.4f}, {p[1]:.4f}) here"),
    st.tuples(
        st.floats(min_value=-95, max_value=95, allow_nan=False),
        st.floats(min_value=-190, max_value=190, allow_nan=False),
    ).map(lambda p: f"at {p[0]:.3f}, {p[1]:.3f} location"),
    st.tuples(
        st.integers(0, 95), st.integers(0, 59), st.integers(0, 59),
        st.sampled_from("NS"),
        st.integers(0, 190), st.integers(0, 59), st.integers(0, 59),
        st.sampled_from("EW"),
    ).map(lambda d: f"{d[0]}°{d[1]}'{d[2]}\"{d[3]} "
                    f"{d[4]}°{d[5]}'{d[6]}\"{d[7]}"),
    st.text(
        alphabet=st.characters(
            codec="ascii", categories=("L", "N", "P", "Z")
        ),
        max_size=80,
    ),
)


@settings(max_examples=200, deadline=None)
@given(_COORD_TEXT)
def test_fuzz_parse_coordinates(geo_ref, text):
    from arkhammirror_spark.operators.geospatial import parse_coordinates

    _, geo = geo_ref
    eng = geo.GeoGraphEngine()
    exp = eng._parse_coordinates(text)
    got = parse_coordinates(text)
    if exp is None:
        assert got is None, text
    else:
        assert got is not None, text
        assert got[0] == pytest.approx(exp[0], rel=1e-12)
        assert got[1] == pytest.approx(exp[1], rel=1e-12)


@settings(max_examples=150, deadline=None)
@given(st.floats(min_value=0, max_value=50, allow_nan=False))
def test_fuzz_chi2_sf_df1(x):
    """The exact closed form vs pinned scipy values + identity."""
    from arkhammirror_spark.operators.hidden_content import chi2_sf_df1

    # identity: sf(x) = erfc(sqrt(x/2)) and monotone decreasing
    assert chi2_sf_df1(x) == pytest.approx(
        math.erfc(math.sqrt(x / 2)) if x > 0 else 1.0
    )
    assert 0.0 <= chi2_sf_df1(x) <= 1.0


def test_chi2_sf_pinned_table():
    """Known chi-square df=1 critical values (standard tables)."""
    from arkhammirror_spark.operators.hidden_content import chi2_sf_df1

    assert chi2_sf_df1(3.841) == pytest.approx(0.05, abs=2e-4)
    assert chi2_sf_df1(6.635) == pytest.approx(0.01, abs=2e-4)
    assert chi2_sf_df1(2.706) == pytest.approx(0.10, abs=2e-4)
    assert chi2_sf_df1(0.0) == 1.0


_WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4),
    min_size=0, max_size=12,
).map(" ".join)


@settings(max_examples=200, deadline=None)
@given(_WORDS, _WORDS)
def test_fuzz_claims_simple_similarity(t1, t2):
    """word-set Jaccard (_simple_similarity, claims shard.py:1321-1330)
    vs the driver mirror of the Spark column math."""
    import importlib.util
    import sys
    import types

    if "arkham_shard_claims.shard" not in sys.modules:
        REF = ("/root/reference/packages/arkham-shard-claims/"
               "arkham_shard_claims")
        frame = types.ModuleType("arkham_frame")
        frame.ArkhamShard = type(
            "ArkhamShard", (), {"__init__": lambda self: None,
                                "name": "claims"}
        )
        sys.modules.setdefault("arkham_frame", frame)
        pkg = types.ModuleType("arkham_shard_claims")
        pkg.__path__ = [REF]
        sys.modules.setdefault("arkham_shard_claims", pkg)
        ms = importlib.util.spec_from_file_location(
            "arkham_shard_claims.models", f"{REF}/models.py"
        )
        models = importlib.util.module_from_spec(ms)
        sys.modules["arkham_shard_claims.models"] = models
        ms.loader.exec_module(models)
        ss = importlib.util.spec_from_file_location(
            "arkham_shard_claims.shard", f"{REF}/shard.py"
        )
        shard = importlib.util.module_from_spec(ss)
        sys.modules["arkham_shard_claims.shard"] = shard
        ss.loader.exec_module(shard)
    shard = sys.modules["arkham_shard_claims.shard"]
    sh = shard.ClaimsShard.__new__(shard.ClaimsShard)
    exp = sh._simple_similarity(t1, t2)
    a = {w for w in t1.lower().split() if w}
    b = {w for w in t2.lower().split() if w}
    got = len(a & b) / len(a | b) if a and b else 0.0
    assert got == pytest.approx(exp, rel=1e-12, abs=1e-12)


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(
        [".png", ".pdf", ".txt", ".zip", ".xyz", "", ".JPG", ".Html"]
    ),
    st.sampled_from(
        ["image/png", "application/pdf", "text/plain", "image/jpeg",
         "application/zip", "text/html", "application/octet-stream",
         "unknown"]
    ),
)
def test_fuzz_mime_decision_table(hidden_ref, ext, mime):
    from arkhammirror_spark.operators.hidden_content import (
        EXT_MIME_MAP, mime_mismatch,
    )

    expected = EXT_MIME_MAP.get(ext.lower(), [])
    exp_mismatch = mime not in expected if expected else False
    got = mime_mismatch(ext, mime)
    assert got[0] == exp_mismatch
    assert got[2] == mime
