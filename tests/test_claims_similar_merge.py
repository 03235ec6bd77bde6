"""Differential tests: operators/claims_ops.py vs the ACTUAL reference
ClaimsShard (arkham-shard-claims/shard.py:880-983, 1321-1330) with its
storage layer overridden by in-memory tables — the similarity math,
match filtering/sorting, merge orchestration (evidence transfer, entity
union, RETRACTED statuses, evidence recounts) run unmodified."""

from __future__ import annotations

import asyncio
import importlib.util
import math
import os
import sys
import types

import pytest

REF_PKG = "/root/reference/packages/arkham-shard-claims/arkham_shard_claims"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PKG), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref():
    """Load the real models.py + shard.py with arkham_frame stubbed."""
    if "arkham_shard_claims.shard" in sys.modules:
        mods = sys.modules
        return mods["arkham_shard_claims.models"], mods["arkham_shard_claims.shard"]
    frame = types.ModuleType("arkham_frame")
    frame.ArkhamShard = type(
        "ArkhamShard", (), {"__init__": lambda self: None, "name": "claims"}
    )
    sys.modules.setdefault("arkham_frame", frame)
    pkg = types.ModuleType("arkham_shard_claims")
    pkg.__path__ = [REF_PKG]
    sys.modules.setdefault("arkham_shard_claims", pkg)
    models_spec = importlib.util.spec_from_file_location(
        "arkham_shard_claims.models", f"{REF_PKG}/models.py"
    )
    models = importlib.util.module_from_spec(models_spec)
    sys.modules["arkham_shard_claims.models"] = models
    models_spec.loader.exec_module(models)
    shard_spec = importlib.util.spec_from_file_location(
        "arkham_shard_claims.shard", f"{REF_PKG}/shard.py"
    )
    shard = importlib.util.module_from_spec(shard_spec)
    sys.modules["arkham_shard_claims.shard"] = shard
    shard_spec.loader.exec_module(shard)
    return models, shard


class _Events:
    def __init__(self):
        self.emitted = []

    async def emit(self, topic, payload, source=None):
        self.emitted.append((topic, payload))


def _make_shard(ref, claims, evidence=(), vectors=None):
    """In-memory ClaimsShard: storage methods overridden, logic real."""
    models, shard_mod = ref

    class _Shard(shard_mod.ClaimsShard):
        def __init__(self):
            self.frame = None
            self._db = None
            self._events = _Events()
            self._llm = None
            self._vectors = vectors
            self._claims = {c.id: c for c in claims}
            self._evidence = list(evidence)

        async def get_claim(self, claim_id):
            return self._claims.get(claim_id)

        async def list_claims(self, limit=100, **kw):
            return list(self._claims.values())[:limit]

        async def get_claim_evidence(self, claim_id):
            return [e for e in self._evidence if e.claim_id == claim_id]

        async def _save_claim(self, claim, update=False):
            self._claims[claim.id] = claim

        async def _save_evidence(self, ev, update=False):
            pass  # mutated in place; the shared list is the store

        async def _update_claim_evidence_counts(self, claim_id):
            # mirror of the three COUNT queries (shard.py:1187-1234)
            evs = [e for e in self._evidence if e.claim_id == claim_id]
            c = self._claims.get(claim_id)
            if c is not None:
                c.evidence_count = len(evs)
                c.supporting_count = sum(
                    1 for e in evs if e.relationship.value == "supports"
                )
                c.refuting_count = sum(
                    1 for e in evs if e.relationship.value == "refutes"
                )

    return _Shard()


# deterministic fuzzy-similarity corpus: template families whose members
# share most words (Jaccard straddles 0.8 at one-word edits on 9-11 word
# claims) plus unrelated fillers
_TEMPLATES = [
    "the finance committee approved the quarterly budget on schedule today",
    "witnesses reported the convoy crossed the northern border before dawn",
    "analysts confirmed the shipment contained forty tons of raw material",
]
_SUBS = ["today", "yesterday", "friday", "quietly"]


def _fuzzy_texts():
    texts = []
    for t in _TEMPLATES:
        words = t.split()
        texts.append(t)
        for i, sub in enumerate(_SUBS):
            w = list(words)
            w[-1] = sub
            if i % 2:
                w[0] = "a"
            texts.append(" ".join(w))
    texts += [
        "completely unrelated filler line number one with distinct words",
        "another separate sentence sharing nothing of importance whatsoever",
    ]
    return texts


def _mk_claims(models, texts):
    return [
        models.Claim(id=f"c{i:03d}", text=t) for i, t in enumerate(texts)
    ]


def _spark_claims(spark, texts):
    return spark.createDataFrame(
        [(f"c{i:03d}", t) for i, t in enumerate(texts)],
        "claim_id string, claim_text string",
    )


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_similar_claims_fuzzy_parity(ref, spark, threshold):
    """Fallback arm (shard.py:909-922): per-claim match sets and scores
    are identical; limit chosen above the max match count so the
    reference's DB-order tiebreak cannot differ."""
    from arkhammirror_spark.operators.claims_ops import similar_claims

    models, _ = ref
    texts = _fuzzy_texts()
    sh = _make_shard(ref, _mk_claims(models, texts))

    exp = {}
    for i in range(len(texts)):
        cid = f"c{i:03d}"
        matches = asyncio.run(
            sh.find_similar_claims(cid, threshold=threshold, limit=100)
        )
        exp[cid] = sorted(
            (m.matched_claim_id, round(m.similarity_score, 9),
             m.match_type, m.suggested_action)
            for m in matches
        )

    got_rows = similar_claims(
        _spark_claims(spark, texts), threshold=threshold, limit=100
    ).collect()
    got = {cid: [] for cid in exp}
    for r in got_rows:
        got[r["claim_id"]].append(
            (r["matched_claim_id"], round(r["similarity_score"], 9),
             r["match_type"], r["suggested_action"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert any(exp.values())  # fixture actually produces matches
    assert got == exp


def test_similar_claims_fuzzy_limit(ref, spark):
    """When limit truncates, the kept SCORE multiset matches (the
    reference's within-tie order is DB order, which has no cross-engine
    meaning; scores are the contract)."""
    from arkhammirror_spark.operators.claims_ops import similar_claims

    models, _ = ref
    texts = _fuzzy_texts()
    sh = _make_shard(ref, _mk_claims(models, texts))
    limit = 2

    df = similar_claims(
        _spark_claims(spark, texts), threshold=0.5, limit=limit
    )
    got_rows = df.collect()
    for i in range(len(texts)):
        cid = f"c{i:03d}"
        matches = asyncio.run(
            sh.find_similar_claims(cid, threshold=0.5, limit=limit)
        )
        exp_scores = sorted(round(m.similarity_score, 9) for m in matches)
        got_scores = sorted(
            round(r["similarity_score"], 9)
            for r in got_rows
            if r["claim_id"] == cid
        )
        assert got_scores == exp_scores, cid


class _Vectors:
    """Vector-service stub: brute cosine over injected embeddings, the
    shape find_similar_claims consumes (shard.py:894-899)."""

    def __init__(self, vecs, text_to_id):
        self.vecs = vecs
        self.text_to_id = text_to_id

    def is_available(self):
        return True

    async def search(self, collection, query, limit):
        qid = self.text_to_id[query]
        q = self.vecs[qid]

        def cos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return d / (na * nb) if na and nb else 0.0

        scored = sorted(
            ((i, cos(q, v)) for i, v in self.vecs.items()),
            key=lambda t: t[1],
            reverse=True,
        )
        return [{"id": i, "score": s} for i, s in scored[:limit]]


def _unit_vecs(n, dim=8):
    """Deterministic cluster structure: three anchor directions, members
    perturbed so in-cluster cosines straddle 0.8 and a few exceed 0.95."""
    vecs = {}
    for i in range(n):
        anchor = i % 3
        base = [0.0] * dim
        base[anchor] = 1.0
        # perturbation magnitude cycles: tight (merge), loose (review), far
        eps = [0.05, 0.3, 1.2][(i // 3) % 3]
        for d in range(dim):
            base[d] += eps * (((i * 7 + d * 13) % 11) - 5) / 11.0
        norm = math.sqrt(sum(x * x for x in base))
        vecs[f"c{i:03d}"] = [x / norm for x in base]
    return vecs


def test_similar_claims_semantic_parity(ref, spark):
    """Vector arm (shard.py:894-908): same embeddings to both engines;
    match sets, scores, and the 0.95 review/merge rule agree. Spark
    candidates use exhaustive banding (rows_per_band=1 → recall 1) so the
    comparison isolates scoring semantics from LSH recall."""
    from arkhammirror_spark.operators.claims_ops import similar_claims_semantic

    models, _ = ref
    n = 18
    vecs = _unit_vecs(n)
    texts = [f"claim text number {i}" for i in range(n)]
    text_to_id = {t: f"c{i:03d}" for i, t in enumerate(texts)}
    sh = _make_shard(
        ref, _mk_claims(models, texts), vectors=_Vectors(vecs, text_to_id)
    )

    exp = {}
    for i in range(n):
        cid = f"c{i:03d}"
        matches = asyncio.run(
            sh.find_similar_claims(cid, threshold=0.8, limit=100)
        )
        exp[cid] = sorted(
            (m.matched_claim_id, round(m.similarity_score, 6),
             m.match_type, m.suggested_action)
            for m in matches
        )

    emb = spark.createDataFrame(
        [(cid, v) for cid, v in vecs.items()],
        "claim_id string, embedding array<double>",
    )
    got_rows = similar_claims_semantic(
        emb, threshold=0.8, limit=100, bands=1, rows_per_band=1
    ).collect()
    got = {f"c{i:03d}": [] for i in range(n)}
    for r in got_rows:
        got[r["claim_id"]].append(
            (r["matched_claim_id"], round(r["similarity_score"], 6),
             r["match_type"], r["suggested_action"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert any("merge" in str(v) for v in exp.values())
    assert any("review" in str(v) for v in exp.values())
    assert got == exp


_MERGE_GROUPS = {"c000": ["c001", "c002", "c000"], "c005": ["c006"]}


def _merge_fixture(models):
    er = models.EvidenceRelationship
    claims = []
    for i in range(8):
        claims.append(
            models.Claim(
                id=f"c{i:03d}",
                text=f"claim {i}",
                entity_ids=[f"e{i}", f"e{i % 3}"],
            )
        )
    evidence = []
    rels = [er.SUPPORTS, er.REFUTES, er.RELATED]
    k = 0
    for i in range(8):
        for j in range(i % 3):
            evidence.append(
                models.Evidence(
                    id=f"ev{k}",
                    claim_id=f"c{i:03d}",
                    evidence_type=list(models.EvidenceType)[0],
                    reference_id=f"r{k}",
                    relationship=rels[j % len(rels)],
                )
            )
            k += 1
    return claims, evidence


def test_merge_claims_parity(ref, spark):
    """merge_claims (shard.py:926-983): ClaimMergeResult counts, member
    RETRACTED statuses + event notes, primary entity unions, evidence
    re-pointing, and recounted evidence totals all agree."""
    from arkhammirror_spark.operators.claims_ops import merge_claims

    models, _ = ref
    claims, evidence = _merge_fixture(models)
    sh = _make_shard(ref, claims, evidence)
    exp_results = {}
    for primary, members in _MERGE_GROUPS.items():
        exp_results[primary] = asyncio.run(
            sh.merge_claims(primary, list(members))
        )

    sclaims = spark.createDataFrame(
        [(c.id, c.status.value, c.entity_ids) for c in claims],
        "claim_id string, status string, entity_ids array<string>",
    )
    # regenerate: the reference run above mutated `evidence` in place
    sev = spark.createDataFrame(
        [(e.id, e.claim_id, e.relationship.value)
         for e in _merge_fixture(models)[1]],
        "evidence_id string, claim_id string, relationship string",
    )
    plan = spark.createDataFrame(
        [(p, m) for p, ms in _MERGE_GROUPS.items() for m in ms],
        "primary_claim_id string, member_id string",
    )
    out = merge_claims(sclaims, plan, evidence=sev)

    # per-group ClaimMergeResult
    got_res = {r["primary_claim_id"]: r for r in out["results"].collect()}
    assert set(got_res) == set(exp_results)
    for pid, mr in exp_results.items():
        g = got_res[pid]
        assert g["evidence_transferred"] == mr.evidence_transferred, pid
        assert g["entities_merged"] == mr.entities_merged, pid
        assert g["merged_count"] == len(
            [m for m in mr.merged_claim_ids if m != pid]
        ), pid

    # claim states: statuses, entity unions, recounts
    got_states = {
        r["claim_id"]: r for r in out["claim_states"].collect()
    }
    all_members = {
        m for p, ms in _MERGE_GROUPS.items() for m in ms if m != p
    }
    for cid, c in sh._claims.items():
        if cid in all_members:
            assert c.status == models.ClaimStatus.RETRACTED
            assert got_states[cid]["status"] == "retracted"
        elif cid in _MERGE_GROUPS:
            g = got_states[cid]
            assert g["status"] == c.status.value
            assert g["entity_ids_out"] == ",".join(sorted(c.entity_ids))
            assert g["evidence_count"] == c.evidence_count
            assert g["supporting_count"] == c.supporting_count
            assert g["refuting_count"] == c.refuting_count
        else:
            assert cid not in got_states  # untouched claims stay out

    # merge notes ride the status-change events (shard.py:707-714)
    notes = {
        p["claim_id"]: p["notes"]
        for t, p in sh._events.emitted
        if t == "claims.claim.status_changed"
    }
    for cid in all_members:
        assert notes[cid] == got_states[cid]["notes"]

    # evidence re-pointing matches the mutated reference store
    got_ev = sorted(
        (r["evidence_id"], r["claim_id"])
        for r in out["evidence_out"].collect()
    )
    exp_ev = sorted((e.id, e.claim_id) for e in sh._evidence)
    assert got_ev == exp_ev
