"""Differential tests: IVF tuning/health math vs the ACTUAL reference
VectorService._optimal_lists/_optimal_probes (vectors.py:469-488) and
VectorMaintenanceService.health_check (vector_maintenance.py:441-518)
with its vectors service stubbed."""

from __future__ import annotations

import asyncio
import datetime
import importlib.util
import os
import sys
import types

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SVC = "/root/reference/packages/arkham-frame/arkham_frame/services"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SVC), reason="reference tree not available"
)


def _load(name, path):
    key = f"_ref_{name}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def vectors_ref():
    return _load("vectors", f"{SVC}/vectors.py")


@pytest.fixture(scope="module")
def maint_ref():
    return _load("vector_maintenance", f"{SVC}/vector_maintenance.py")


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=5_000_000_000))
def test_fuzz_optimal_lists(vectors_ref, rows):
    from arkhammirror_spark.operators.similarity import optimal_lists

    svc = vectors_ref.VectorService.__new__(vectors_ref.VectorService)
    assert optimal_lists(rows) == svc._optimal_lists(rows)
    # the maintenance copy is the same formula
    maint = sys.modules.get("_ref_vector_maintenance")
    if maint is not None:
        m = maint.VectorMaintenanceService.__new__(
            maint.VectorMaintenanceService
        )
        assert optimal_lists(rows) == m._calculate_optimal_lists(rows)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=200_000),
    st.sampled_from([0.90, 0.95, 0.99, 0.999]),
)
def test_fuzz_optimal_probes(vectors_ref, lists, recall):
    from arkhammirror_spark.operators.similarity import optimal_probes

    svc = vectors_ref.VectorService.__new__(vectors_ref.VectorService)
    svc._target_recall = 0.95
    assert optimal_probes(lists, recall) == svc._optimal_probes(
        lists, recall
    )


class _Coll:
    def __init__(self, name):
        self.name = name


class _Info(types.SimpleNamespace):
    pass


class _VecStub:
    def __init__(self, infos):
        self.infos = infos

    async def list_collections(self):
        return [_Coll(n) for n in self.infos]

    async def get_collection_info(self, name):
        return self.infos[name]


def test_health_check_parity(maint_ref, spark):
    """Drive the REAL health_check over stubbed collections; the Spark
    op over the same catalog must produce the same warning ledger and
    flags. Reindex offsets carry ≥1h slack so the reference's
    utcnow-based day count equals the date-granular datediff."""
    from arkhammirror_spark.operators.similarity import ivf_health_check

    now = datetime.datetime.utcnow()
    infos = {}
    rows = []
    for i in range(12):
        vc = [0, 500, 40_000, 2_500_000][i % 4] + i * 137
        current = [0, 10, 700, 2100][i % 4] + (i % 3) * 13
        days_ago = (i * 5) % 35
        last = (
            now - datetime.timedelta(days=days_ago, hours=2)
            if i % 6 != 5 else None
        )
        name = f"c{i:02d}"
        infos[name] = _Info(
            vector_count=vc, vector_size=64, index_type="ivfflat",
            lists=current, probes=10, last_reindex=last,
        )
        rows.append((
            name, vc, current,
            (now.date() - datetime.timedelta(days=days_ago))
            if last else None,
        ))

    m = maint_ref.VectorMaintenanceService.__new__(
        maint_ref.VectorMaintenanceService
    )
    m._vectors = _VecStub(infos)
    m._health_history = []
    m._config = {"max_history": 10}
    exp = asyncio.run(m.health_check())
    assert exp.status in ("healthy", "warning")

    cat = spark.createDataFrame(
        rows,
        "name string, vector_count long, lists long, last_reindex date",
    )
    got = {
        r["name"]: r
        for r in ivf_health_check(cat, now.date()).collect()
    }
    got_warnings = sorted(
        w for r in got.values() for w in r["warnings"].split("|") if w
    )
    assert got_warnings == sorted(exp.warnings)
    assert len(got_warnings) > 0  # the fixture actually warns
    # per-collection flags consistent with the emitted warnings
    for name, r in got.items():
        assert r["lists_suboptimal"] == any(
            w.startswith(f"{name}: lists=") for w in exp.warnings
        )
        assert r["reindex_overdue"] == any(
            w.startswith(f"{name}: last reindex") for w in exp.warnings
        )
