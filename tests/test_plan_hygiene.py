"""Plan-hygiene gate: every registry query must be free of row-at-a-time
Python, and document-table queries must column-prune their scans. Plan-only
(no execution) so the whole sweep is fast."""

import pytest

from arkhammirror_spark.plans import (
    has_row_python,
    python_node_count,
    pushed_filters,
    read_schema,
    unpartitioned_windows,
)
from arkhammirror_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# (min, max) Arrow-batched python nodes a query's plan may print. Queries
# whose semantics genuinely need grouped-pandas execution get exactly one
# node per branch; plans that print a reused subtree in several branches
# (execution reuses the exchange) get a wider bound.
_ARROW_BOUNDS = {
    "mentions": (1, 1),
    "entities": (1, 1),
    "comention_edges": (1, 1),
    "claims": (1, 1),
    "relations_cooccur": (1, 1),
    "chunk_fixed": (1, 1),
    "chunk_sentences": (1, 1),
    "coref_resolutions": (1, 1),
    "format_extracts": (1, 1),
    "archive_members": (1, 1),
    "rels_dedup": (1, 1),
    "edge_degrees": (1, 2),       # union prints the edge subtree twice
    "linked_mentions": (0, 1),    # checkpointed mention pass truncates lineage
    "graph_stats": (1, 3),        # stats crossJoin prints the edge subtree 3x
    # iterative graph queries checkpoint per round; the residual nodes are
    # the final round's (bounded) join branches
    "graph_components": (0, 2),
    "graph_pagerank": (0, 2),
    "graph_ego": (0, 2),          # operates on checkpointed edges
    "warc_ingest": (2, 2),        # WARC parse pass + extract pass
    "ann_ivf_topk": (0, 0),       # MLlib fit happens at plan build
    "chunk_strategy_paragraph": (1, 1),
    "ner_model_mentions": (1, 1),
    "image_quality": (1, 1),      # the five-heuristic metrics pass
    "audio_features": (1, 1),
    "video_frame_samples": (1, 1),
    "image_features": (1, 1),     # the gated decode mapInPandas pass
    "main_content": (1, 1),       # DOM flatten pass; scoring is native
    # the flatten pass and the shingle pass are both checkpoint-truncated:
    # no Python node may survive into the final plan
    "webtext_prep": (0, 0),
    # eager checkpoint (broadcast release) truncates the transit pass
    "graph_betweenness": (0, 0),
    "image_phash": (1, 1),        # the gated decode+hash mapInPandas pass
    "image_neardup": (0, 0),      # slim sigs checkpoint truncates the pass
    # full_scan lazily localCheckpoints its UDF output, so the printed
    # plan is already truncated to the checkpoint scan (0 nodes)
    "media_metadata": (0, 1),
    "ela_metrics": (1, 1),        # the gated resave+diff pass
    "c2pa_scan": (1, 1),          # the stdlib JUMBF sniff pass
    # lazy-checkpointed slim occurrence frame, same truncation
    "entity_correlations": (0, 4),
    # one Arrow pass: the entropy/LSB/magic scan (hashes stay native)
    "hidden_content": (1, 1),
}


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_no_row_python_and_bounded_arrow(spark, name):
    df = QUERIES[name](spark, SF)
    assert not has_row_python(df), f"{name}: BatchEvalPython in plan"
    n_py = python_node_count(df)
    lo, hi = _ARROW_BOUNDS.get(name, (0, 0))
    assert lo <= n_py <= hi, (
        f"{name}: expected {lo}..{hi} Arrow node(s), got {n_py}"
    )
    # No single-partition WindowExec anywhere in a registry query's plan
    # (`WARN WindowExec: No Partition Defined` — the global-rank
    # scale-killer; r8 replaced every such site with distributed top-k /
    # range-partitioned rank constructions).
    wins = unpartitioned_windows(df)
    assert not wins, f"{name}: unpartitioned Window node(s): {wins}"


def test_document_scans_are_pruned(spark):
    # native doc queries must not read lang/source columns they don't use
    for name in ("text_quality_flags", "doc_fingerprint", "token_stats"):
        schemas = read_schema(QUERIES[name](spark, SF))
        assert schemas, name
        assert all("source" not in s and "lang" not in s for s in schemas), (
            name,
            schemas,
        )


def test_filter_pushdown_reaches_parquet(spark):
    pushed = pushed_filters(QUERIES["pricing_summary"](spark, SF))
    assert any("l_shipdate" in p for p in pushed)
    pushed = pushed_filters(QUERIES["embedding_knn"](spark, SF))
    assert any("vec_id" in p for p in pushed)


def test_fuzzy_linking_is_blocked_equi_join(spark):
    """The fuzzy tier must compile to a shuffled/broadcast HASH equi-join on
    the block key — never a BroadcastNestedLoopJoin (O(M×C) Levenshtein)."""
    from arkhammirror_spark.operators.linking import link_mentions

    mentions = spark.createDataFrame(
        [("u1", "Acme Corp"), ("u2", "Acme Corpx")], "url: string, text: string"
    )
    canon = spark.createDataFrame(
        [("acme corp", "C1")], "name_lower: string, canonical_id: string"
    )
    plan = (
        link_mentions(mentions, canon)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_contradiction_candidates_no_cartesian(spark):
    from arkhammirror_spark.operators.contradictions import candidate_claim_pairs

    claims = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d")], "claim_id: long, claim_text: string"
    )
    plan = (
        candidate_claim_pairs(claims)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    # the only permissible nested-loop is the 1-row corpus-count broadcast
    # (cost O(|vocab|)); the claim-pair join itself must never nested-loop
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "cid" not in line and "id_a" not in line, line
            assert "_n#" in line, line  # scalar count build side


def test_driver_java_options_merge():
    """Caller-supplied spark.driver.extraJavaOptions must be MERGED with
    the log4j2 deny-filter flag, not silently replaced (ADVICE r6) — and a
    caller pinning their own log4j config wins."""
    from arkhammirror_spark.session import _merge_driver_java_options

    flag = "-Dlog4j.configurationFile=file:/x/log4j2.properties"
    assert _merge_driver_java_options("", flag) == flag
    merged = _merge_driver_java_options("-XX:+UseG1GC -Dfoo=1", flag)
    assert flag in merged and "-XX:+UseG1GC" in merged and "-Dfoo=1" in merged
    pinned = "-Dlog4j.configurationFile=file:/theirs.properties -Dbar=2"
    assert _merge_driver_java_options(pinned, flag) == pinned
