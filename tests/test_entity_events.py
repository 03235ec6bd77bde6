"""Differential tests: operators/entity_events.py vs the ACTUAL reference
TimelineShard._link_entities_to_events (shard.py:559-664) and
get_entity_timeline (:485-557) — real shard class, database/API stubbed,
the name-index build, word-boundary matching, and merge logic run
unmodified."""

from __future__ import annotations

import asyncio
import datetime as dt
import importlib.machinery
import importlib.util
import json
import os
import random
import string
import sys
import types

import pytest

from pyspark.sql import functions as F

from arkhammirror_spark.operators.entity_events import (
    entity_name_index,
    entity_timeline,
    entity_timeline_summary,
    link_entities_to_events,
)

REF_PKG = "/root/reference/packages/arkham-shard-timeline/arkham_shard_timeline"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PKG), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref():
    """Load the real models.py + shard.py with arkham_frame and the
    FastAPI router stubbed (the linking logic imports neither)."""
    if "arkham_shard_timeline.shard" in sys.modules:
        m = sys.modules
        return m["arkham_shard_timeline.models"], m["arkham_shard_timeline.shard"]

    frame_pkg = sys.modules.setdefault(
        "arkham_frame", types.ModuleType("arkham_frame")
    )
    si = types.ModuleType("arkham_frame.shard_interface")
    si.__spec__ = importlib.machinery.ModuleSpec(
        "arkham_frame.shard_interface", None
    )

    class ArkhamShard:
        name = "unknown"
        version = "0.0.0"
        description = ""

        def __init__(self):
            self.frame = None

        def get_tenant_id_or_none(self):
            return None

    si.ArkhamShard = ArkhamShard
    sys.modules["arkham_frame.shard_interface"] = si
    frame_pkg.shard_interface = si

    pkg = types.ModuleType("arkham_shard_timeline")
    pkg.__path__ = [REF_PKG]
    sys.modules.setdefault("arkham_shard_timeline", pkg)

    api = types.ModuleType("arkham_shard_timeline.api")
    api.__spec__ = importlib.machinery.ModuleSpec(
        "arkham_shard_timeline.api", None
    )
    api.init_api = lambda *a, **k: None
    api.router = None
    sys.modules["arkham_shard_timeline.api"] = api

    for leaf in ("models", "extraction", "merging", "conflicts", "shard"):
        name = f"arkham_shard_timeline.{leaf}"
        if name in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF_PKG, f"{leaf}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return (
        sys.modules["arkham_shard_timeline.models"],
        sys.modules["arkham_shard_timeline.shard"],
    )


class _FakeDB:
    """fetch_all returns the pinned entity rows (dict rows, like the
    reference's database service), applying the query's
    `WHERE name IS NOT NULL AND name != ''` the way the real DB would."""

    def __init__(self, rows):
        self.rows = rows

    async def fetch_all(self, query, params=None):
        return [
            r for r in self.rows
            if r.get("name") is not None and r.get("name") != ""
        ]


def _make_shard(ref, entity_rows):
    models, shard_mod = ref
    shard = shard_mod.TimelineShard()
    shard.database_service = _FakeDB(entity_rows)
    return shard


_VOCAB = [
    "acme corp", "acme", "Johnson", "Dana Johnson", "the board",
    "spark", "merge deal", "court", "hearing-day", "O'Neill",
    "ACME CORP", "west wing", "Unit 7", "x",
]


def _fuzz_fixture(seed: int, n_entities: int = 10, n_events: int = 24):
    """Random entities (names + aliases drawn from a shared pool so
    collisions and the first-occurrence alias rule actually fire) and
    random events whose text embeds entity names at word boundaries,
    inside larger words, and with punctuation adjacency."""
    rng = random.Random(seed)
    pool = list(_VOCAB) + [
        "".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 8)))
        for _ in range(8)
    ]
    rows = []
    for i in range(n_entities):
        name = rng.choice(pool + ["", "  "])  # some empty → skipped
        aliases = rng.sample(pool, rng.randint(0, 3))
        rows.append(
            {
                "id": f"ent{i:02d}",
                "name": name,
                "aliases": json.dumps(aliases),
                "entity_type": "person",
            }
        )
    filler = ["filed", "went", "to", "with", "signing", "by", "over"]
    events = []
    for j in range(n_events):
        bits = []
        for _ in range(rng.randint(2, 6)):
            if rng.random() < 0.5:
                e = rng.choice(pool)
                # sometimes glue the name into a larger word (no match)
                if rng.random() < 0.25:
                    e = e + "ish"
                if rng.random() < 0.2:
                    e = e.upper()
                bits.append(e)
            else:
                bits.append(rng.choice(filler))
            if rng.random() < 0.2:
                bits[-1] = bits[-1] + ","
        text = " ".join(bits)
        existing = (
            [f"pre{rng.randint(0, 2)}"] if rng.random() < 0.3 else []
        )
        events.append(
            {
                "id": f"ev{j:03d}",
                "document_id": f"d{j % 5}",
                "text": text if rng.random() > 0.08 else "",
                "date_start": dt.datetime(2024, 1, 1)
                + dt.timedelta(days=rng.randint(0, 90)),
                "entities": existing,
            }
        )
    return rows, events


def _ref_link(ref, entity_rows, events):
    models, _ = ref
    shard = _make_shard(ref, entity_rows)
    evs = [
        models.TimelineEvent(
            id=e["id"],
            document_id=e["document_id"],
            text=e["text"],
            date_start=e["date_start"],
            entities=list(e["entities"]),
        )
        for e in events
    ]
    out = asyncio.run(shard._link_entities_to_events(evs))
    return {e.id: sorted(set(e.entities)) for e in out}


def _spark_link(spark, entity_rows, events):
    ents = spark.createDataFrame(
        [
            (r["id"], r["name"], json.loads(r["aliases"]))
            for r in entity_rows
        ],
        "id string, name string, aliases array<string>",
    )
    evs = spark.createDataFrame(
        [
            (e["id"], e["text"], list(e["entities"]))
            for e in events
        ],
        "id string, text string, entities array<string>",
    )
    linked = link_entities_to_events(
        evs, ents, entity_id_col="id", order_col="id"
    )
    return {
        r["id"]: sorted(set(r["entities"] or []))
        for r in linked.collect()
    }


@pytest.mark.parametrize("seed", range(8))
def test_link_parity_fuzz(ref, spark, seed):
    """Matched entity sets must be identical to the reference across
    random fixtures exercising alias collisions, case folding, embedded
    substrings, punctuation adjacency, empty names/texts, and existing
    entity merging. Reference rows are fed in id order — the operator's
    documented deterministic ordering."""
    entity_rows, events = _fuzz_fixture(seed)
    entity_rows = sorted(entity_rows, key=lambda r: r["id"])
    exp = _ref_link(ref, entity_rows, events)
    got = _spark_link(spark, entity_rows, events)
    assert got == exp


def test_alias_first_occurrence_rule(ref, spark):
    """Planted collisions: a later entity's alias equal to an earlier
    entity's name/alias is suppressed; a later PRIMARY name is not."""
    entity_rows = [
        {"id": "e1", "name": "Acme", "aliases": '["The Firm", "AC"]'},
        # alias "acme" collides with e1's name → suppressed
        {"id": "e2", "name": "Borg", "aliases": '["Acme", "BG"]'},
        # primary name collides with e1's alias → still matches
        {"id": "e3", "name": "The Firm", "aliases": "[]"},
        # alias collides with e2's accepted alias "BG" → suppressed
        {"id": "e4", "name": "Zed", "aliases": '["bg"]'},
    ]
    events = [
        {"id": "ev1", "document_id": "d", "text": "acme filed.",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
        {"id": "ev2", "document_id": "d", "text": "the firm met BG.",
         "date_start": dt.datetime(2024, 1, 2), "entities": []},
        {"id": "ev3", "document_id": "d", "text": "zed & borg",
         "date_start": dt.datetime(2024, 1, 3), "entities": ["seed"]},
    ]
    exp = _ref_link(ref, entity_rows, events)
    got = _spark_link(spark, entity_rows, events)
    assert got == exp
    assert got["ev1"] == ["e1"]          # not e2 (alias suppressed)
    assert set(got["ev2"]) == {"e1", "e2", "e3"}  # name reclaims string
    assert got["ev3"] == ["e2", "e4", "seed"]


def test_regex_metachars_quoted(ref, spark):
    """Names containing regex metacharacters must match literally (the
    reference re.escape's them; the operator \\Q-quotes them)."""
    entity_rows = [
        {"id": "e1", "name": "a.c", "aliases": "[]"},
        {"id": "e2", "name": "unit (7)", "aliases": "[]"},
        {"id": "e3", "name": "c++ lab", "aliases": "[]"},
    ]
    events = [
        {"id": "ev1", "document_id": "d", "text": "met a.c today",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
        {"id": "ev2", "document_id": "d", "text": "abc is not it",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
        {"id": "ev3", "document_id": "d", "text": "in unit (7) with c++ lab",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
    ]
    exp = _ref_link(ref, entity_rows, events)
    got = _spark_link(spark, entity_rows, events)
    assert got == exp
    assert got["ev1"] == ["e1"] and got["ev2"] == []
    # "unit (7)" does NOT match: the trailing \b after ')' needs a word
    # char on one side ( ')' and ' ' are both non-word ) — identical in
    # Python re and Java; "c++ lab" ends on a word char and does match.
    assert got["ev3"] == ["e3"]


def test_entity_timeline_parity(ref, spark):
    """get_entity_timeline: date-range filtering (inclusive bounds via
    strict-inequality skips), date_range aggregate, related entities."""
    models, shard_mod = ref
    entity_rows, events = _fuzz_fixture(3)
    entity_rows = sorted(entity_rows, key=lambda r: r["id"])
    # link first so events actually carry entities
    linked = _ref_link(ref, entity_rows, events)
    for e in events:
        e["entities"] = linked[e["id"]]
    target = next(
        (eid for ev in events for eid in ev["entities"]), None
    )
    assert target is not None

    class _Shard(shard_mod.TimelineShard):
        def __init__(self, evs):
            self.frame = None
            self.database_service = _FakeDB([])
            self.entities_service = object()
            self._evs = evs

        async def _get_events_for_entity(self, entity_id):
            return [e for e in self._evs if entity_id in e.entities]

    evs_obj = [
        models.TimelineEvent(
            id=e["id"], document_id=e["document_id"], text=e["text"],
            date_start=e["date_start"], entities=list(e["entities"]),
        )
        for e in events
    ]
    lo = dt.datetime(2024, 1, 15)
    hi = dt.datetime(2024, 3, 1)
    dr = models.DateRange(start=lo, end=hi)
    tl = asyncio.run(
        _Shard(evs_obj).get_entity_timeline(
            target, date_range=dr, include_related=True
        )
    )

    sdf = spark.createDataFrame(
        [
            (e["id"], e["text"], e["date_start"], list(e["entities"]))
            for e in events
        ],
        "id string, text string, date_start timestamp, "
        "entities array<string>",
    )
    got_events = entity_timeline(sdf, target, lo, hi).collect()
    assert sorted(r["id"] for r in got_events) == sorted(
        e.id for e in tl.events
    )
    summ = entity_timeline_summary(sdf, target, lo, hi).collect()[0]
    assert summ["event_count"] == tl.count
    if tl.events:
        assert summ["range_start"] == tl.date_range.start
        assert summ["range_end"] == tl.date_range.end
    assert sorted(summ["related_entities"].split(",")) == sorted(
        tl.related_entities
    ) or (summ["related_entities"] == "" and not tl.related_entities)


def test_no_nested_loop_join_in_plan(spark):
    """The blocked arm must plan as an equi-join (hash/broadcast-hash),
    never BroadcastNestedLoopJoin over the corpus — the cross arm only
    carries no-word-char names (empty here)."""
    ents = spark.createDataFrame(
        [("e1", "acme corp", ["ac"]), ("e2", "borg", [])],
        "id string, name string, aliases array<string>",
    )
    evs = spark.createDataFrame(
        [("ev1", "acme corp filed", ["x"])],
        "id string, text string, entities array<string>",
    )
    out = link_entities_to_events(evs, ents, entity_id_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    rows = {r["id"]: r["entities"] for r in out.collect()}
    assert rows["ev1"] == ["e1", "x"]


def test_backslash_and_quote_terminator_names(ref, spark):
    """Names containing backslashes — including a literal \\E, which
    terminates Java's \\Q quoting and must be split-escaped — match
    literally and identically to the reference's re.escape path."""
    entity_rows = [
        {"id": "e1", "name": r"acme\E corp", "aliases": "[]"},
        {"id": "e2", "name": r"x\y", "aliases": "[]"},
        {"id": "e3", "name": "a+b", "aliases": "[]"},
    ]
    events = [
        {"id": "ev1", "document_id": "d", "text": r"met acme\E corp today",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
        {"id": "ev2", "document_id": "d", "text": r"path x\y here",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
        {"id": "ev3", "document_id": "d", "text": "sum a+b done",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
        {"id": "ev4", "document_id": "d", "text": "acme corp and xy and ab",
         "date_start": dt.datetime(2024, 1, 1), "entities": []},
    ]
    exp = _ref_link(ref, entity_rows, events)
    got = _spark_link(spark, entity_rows, events)
    assert got == exp
    assert got["ev1"] == ["e1"] and got["ev2"] == ["e2"]
    assert got["ev3"] == ["e3"] and got["ev4"] == []
