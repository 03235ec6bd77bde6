"""Temporal graph evolution — snapshots, deltas, and churn metrics.

Reference lineage: arkham-shard-graph/temporal.py (`TemporalGraphEngine`):
- ``get_temporal_range`` (:131-187): min/max mention timestamps,
  distinct days, the interval auto-rule (≤7d → 1d, ≤30d → 7d,
  ≤365d → 30d, else 90d), snapshot_count = max(1, days // interval).
- ``generate_snapshots`` (:189-265) + ``get_snapshot_at`` (:267-407):
  snapshots at interval steps (interval re-widened to fit
  ``max_snapshots``, :229-233). Snapshot membership is MENTION-driven:
  an entity is present iff it has a mention passing the date filter
  (cumulative ``created_at <= ts``, or the inclusive window
  ``ts - interval <= created_at <= ts``, :298-306); an edge is present
  iff some document carries in-filter mentions of both entities
  (:344-363). Each snapshot records added/removed node and edge sets vs
  the previous snapshot (:249-256; snapshot 0 diffs the empty set) and
  the n(n−1)/2 density (:384-388).
- ``calculate_evolution_metrics`` (:409-474): added/removed totals,
  growth per interval, the FIRST peak snapshot, stable elements present
  in every snapshot, churn vs the final counts.
- ``filter_snapshot_by_date_range`` (:476-532).

The reference materializes every snapshot with one SQL round trip per
snapshot and diffs sets in driver Python. Here nothing is materialized
per snapshot:

- cumulative mode: membership is monotone, so each element reduces to
  its FIRST-member snapshot index (entities: min mention date; edges:
  min over docs of max(first mention of either endpoint in that doc))
  — counts come from one broadcast range-join against the
  ≤``max_snapshots`` snapshot frame, added = the k_first group,
  removals are structurally zero, stable = k_first == 0.
- windowed mode: each mention lands in at most TWO windows (step ==
  window, inclusive bounds), so the membership frame is ≤2× the
  mention count — never |snapshots|× — and added/removed are two
  anti-joins against the k−1 shift.

Both modes cost a fixed number of shuffles regardless of snapshot
count; the reference's ORDER BY … LIMIT 500/1000 caps (:323, :362) are
visualization caps, deliberately absent from the corpus-scale series
(the repo-wide cap convention for graph lanes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def temporal_range(
    mentions: DataFrame, ts_col: str = "created_at"
) -> DataFrame:
    """get_temporal_range (:146-183) as one aggregation. Returns
    (earliest, latest, distinct_days, interval_days, snapshot_count)."""
    agg = mentions.where(F.col(ts_col).isNotNull()).agg(
        F.min(ts_col).alias("earliest"),
        F.max(ts_col).alias("latest"),
        F.count_distinct(F.to_date(ts_col)).alias("distinct_days"),
    )
    total_days = F.datediff(F.to_date("latest"), F.to_date("earliest"))
    interval = (
        F.when(total_days <= 7, 1)
        .when(total_days <= 30, 7)
        .when(total_days <= 365, 30)
        .otherwise(90)
    )
    return agg.select(
        "earliest", "latest",
        F.greatest("distinct_days", F.lit(1)).alias("distinct_days"),
        interval.alias("interval_days"),
        F.greatest(
            F.floor(total_days / interval), F.lit(1)
        ).cast("long").alias("snapshot_count"),
    )


def _fit_interval(start, end, interval_days: int, max_snapshots: int) -> int:
    """The max_snapshots re-widening rule (:229-233) on driver ints."""
    total_days = (end - start).days
    total_intervals = max(1, total_days // max(1, interval_days))
    if total_intervals > max_snapshots:
        interval_days = max(1, total_days // max_snapshots)
    return interval_days


def _snaps_frame(spark, start, n_snap: int, interval_days: int):
    return spark.range(n_snap).select(
        F.col("id").alias("k"),
        F.date_add(
            F.lit(str(start)).cast("date"),
            (F.col("id") * interval_days).cast("int"),
        ).alias("snap_date"),
    )


def _pair_first(de_first: DataFrame) -> DataFrame:
    """(source, target, d0): per-document co-presence pairs, pair-doc
    first date = max of the endpoints' first mention dates in that doc,
    pair first date = min over docs — the cumulative-mode edge clock
    (temporal.py:350, MIN(GREATEST(m1.created_at, m2.created_at)))."""
    a, b = de_first.alias("a"), de_first.alias("b")
    return (
        a.join(
            b,
            (F.col("a.document_id") == F.col("b.document_id"))
            & (F.col("a.entity_id") < F.col("b.entity_id")),
        )
        .select(
            F.col("a.entity_id").alias("source"),
            F.col("b.entity_id").alias("target"),
            F.greatest(F.col("a.d0"), F.col("b.d0")).alias("pd0"),
        )
        .groupBy("source", "target")
        .agg(F.min("pd0").alias("d0"))
    )


def _entity_pairs_per_doc(de: DataFrame, extra_keys: list[str]):
    """Self-join document-level entity presence into unordered pairs —
    the co-mention shape (temporal.py:351-354, m1.entity_id <
    m2.entity_id)."""
    keys = ["document_id", *extra_keys]
    a = de.alias("a")
    b = de.alias("b")
    cond = F.col("a.entity_id") < F.col("b.entity_id")
    for kcol in keys:
        cond = cond & (F.col(f"a.{kcol}") == F.col(f"b.{kcol}"))
    sel = [
        F.col("a.entity_id").alias("source"),
        F.col("b.entity_id").alias("target"),
        *[F.col(f"a.{kcol}").alias(kcol) for kcol in keys],
    ]
    return a.join(b, cond).select(*sel)


def snapshot_series(
    mentions: DataFrame,
    start,
    end,
    interval_days: int,
    cumulative: bool = True,
    max_snapshots: int = 50,
    entity_col: str = "entity_id",
    doc_col: str = "document_id",
    ts_col: str = "created_at",
) -> DataFrame:
    """The per-snapshot summary stream of generate_snapshots: one row
    per snapshot with node/edge counts, density, and added/removed
    counts vs the previous snapshot."""
    spark = mentions.sparkSession
    interval_days = _fit_interval(start, end, interval_days, max_snapshots)
    n_snap = (end - start).days // interval_days + 1
    snaps = _snaps_frame(spark, start, n_snap, interval_days)

    m = mentions.select(
        F.col(entity_col).alias("entity_id"),
        F.col(doc_col).alias("document_id"),
        F.to_date(ts_col).alias("d"),
    ).where(F.col("d").isNotNull())

    if cumulative:
        # entity first-member index: smallest k with snap_date >= min d
        ent_first = m.groupBy("entity_id").agg(F.min("d").alias("d0"))
        # doc-level first presence per entity, then pair-first
        de_first = m.groupBy("document_id", "entity_id").agg(
            F.min("d").alias("d0")
        )
        pairs = _pair_first(de_first)

        def summarize(el: DataFrame, prefix: str) -> DataFrame:
            days = F.datediff(F.col("d0"), F.lit(str(start)).cast("date"))
            kf = F.greatest(
                F.ceil(days / F.lit(interval_days)), F.lit(0)
            ).alias("k_first")
            sp = el.select(kf).where(F.col("k_first") < n_snap)
            counts = (
                sp.crossJoin(F.broadcast(snaps))
                .where(F.col("k") >= F.col("k_first"))
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias(f"{prefix}_count"))
            )
            added = sp.groupBy(F.col("k_first").alias("k")).agg(
                F.count(F.lit(1)).alias(f"{prefix}s_added")
            )
            return (
                snaps.join(counts, "k", "left")
                .join(added, "k", "left")
                .select(
                    "k",
                    F.coalesce(f"{prefix}_count", F.lit(0)).alias(
                        f"{prefix}_count"
                    ),
                    F.coalesce(f"{prefix}s_added", F.lit(0)).alias(
                        f"{prefix}s_added"
                    ),
                    F.lit(0).alias(f"{prefix}s_removed"),
                )
            )

        node_sum = summarize(ent_first, "node")
        edge_sum = summarize(pairs, "edge")
    else:
        member_n, member_e = _window_memberships(
            m, snaps, interval_days
        )

        def summarize(mem: DataFrame, keys: list[str], prefix: str):
            counts = mem.groupBy("k").agg(
                F.count(F.lit(1)).alias(f"{prefix}_count")
            )
            prev = mem.select(
                *keys, (F.col("k") + 1).alias("k")
            ).where(F.col("k") < n_snap)
            added = (
                mem.join(prev, [*keys, "k"], "left_anti")
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias(f"{prefix}s_added"))
            )
            removed = (
                prev.join(mem, [*keys, "k"], "left_anti")
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias(f"{prefix}s_removed"))
            )
            return (
                snaps.join(counts, "k", "left")
                .join(added, "k", "left")
                .join(removed, "k", "left")
                .select(
                    "k",
                    F.coalesce(f"{prefix}_count", F.lit(0)).alias(
                        f"{prefix}_count"
                    ),
                    F.coalesce(f"{prefix}s_added", F.lit(0)).alias(
                        f"{prefix}s_added"
                    ),
                    F.coalesce(f"{prefix}s_removed", F.lit(0)).alias(
                        f"{prefix}s_removed"
                    ),
                )
            )

        node_sum = summarize(member_n, ["entity_id"], "node")
        edge_sum = summarize(member_e, ["source", "target"], "edge")

    n = F.col("node_count")
    e = F.col("edge_count")
    max_edges = F.when(n > 1, n * (n - 1) / 2).otherwise(F.lit(1.0))
    return (
        node_sum.join(edge_sum, "k")
        .join(snaps, "k")
        .select(
            F.col("k").cast("long").alias("snapshot_idx"),
            F.col("snap_date").alias("snapshot_date"),
            n.cast("long").alias("node_count"),
            e.cast("long").alias("edge_count"),
            (e / max_edges).alias("density"),
            F.col("nodes_added").cast("long"),
            F.col("nodes_removed").cast("long"),
            F.col("edges_added").cast("long"),
            F.col("edges_removed").cast("long"),
        )
    )


def _window_memberships(m: DataFrame, snaps, interval_days: int):
    """Distinct (entity, k) and (source, target, k) window memberships.
    Each mention joins at most two windows (inclusive bounds, step ==
    window), so the expansion is ≤2×|mentions|."""
    in_window = (F.col("d") <= F.col("snap_date")) & (
        F.col("d") >= F.date_sub(F.col("snap_date"), interval_days)
    )
    mk = m.crossJoin(F.broadcast(snaps)).where(in_window)
    member_n = mk.select("entity_id", "k").distinct()
    dek = mk.select("document_id", "entity_id", "k").distinct()
    member_e = _entity_pairs_per_doc(dek, ["k"]).select(
        "source", "target", "k"
    ).distinct()
    return member_n, member_e


def stable_counts(
    mentions: DataFrame,
    start,
    end,
    interval_days: int,
    cumulative: bool = True,
    max_snapshots: int = 50,
    entity_col: str = "entity_id",
    doc_col: str = "document_id",
    ts_col: str = "created_at",
) -> tuple[int, int]:
    """Elements present in EVERY snapshot (:446-459) — cumulative:
    first-member index 0; windowed: distinct window count == n_snap."""
    spark = mentions.sparkSession
    interval_days = _fit_interval(start, end, interval_days, max_snapshots)
    n_snap = (end - start).days // interval_days + 1
    m = mentions.select(
        F.col(entity_col).alias("entity_id"),
        F.col(doc_col).alias("document_id"),
        F.to_date(ts_col).alias("d"),
    ).where(F.col("d").isNotNull())
    start_d = F.lit(str(start)).cast("date")

    if cumulative:
        sn = (
            m.groupBy("entity_id")
            .agg(F.min("d").alias("d0"))
            .where(F.col("d0") <= start_d)
            .count()
        )
        de_first = m.groupBy("document_id", "entity_id").agg(
            F.min("d").alias("d0")
        )
        se = _pair_first(de_first).where(F.col("d0") <= start_d).count()
        return sn, se

    snaps = _snaps_frame(spark, start, n_snap, interval_days)
    member_n, member_e = _window_memberships(m, snaps, interval_days)
    sn = (
        member_n.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("nk"))
        .where(F.col("nk") == n_snap)
        .count()
    )
    se = (
        member_e.groupBy("source", "target")
        .agg(F.count(F.lit(1)).alias("nk"))
        .where(F.col("nk") == n_snap)
        .count()
    )
    return sn, se


def evolution_metrics(
    summary: DataFrame,
    stable_node_count: int = 0,
    stable_edge_count: int = 0,
) -> DataFrame:
    """calculate_evolution_metrics (:409-474) over the summary stream:
    added/removed totals, growth per interval, the FIRST peak snapshot
    (strictly-greater updates, :440-444), churn vs the final counts.
    Stable counts come from :func:`stable_counts` (the summary stream
    alone cannot attribute removals to the snapshot-0 cohort)."""
    rows = summary.orderBy("snapshot_idx").collect()
    if not rows:
        raise ValueError("empty snapshot summary")
    totals = {
        "na": sum(r["nodes_added"] for r in rows),
        "nr": sum(r["nodes_removed"] for r in rows),
        "ea": sum(r["edges_added"] for r in rows),
        "er": sum(r["edges_removed"] for r in rows),
    }
    peak = max(rows, key=lambda r: (r["node_count"], -r["snapshot_idx"]))
    num_intervals = max(1, len(rows) - 1)
    final_nodes = rows[-1]["node_count"]
    final_edges = rows[-1]["edge_count"]
    spark = summary.sparkSession
    return spark.createDataFrame(
        [(
            int(totals["na"]), int(totals["nr"]), int(totals["ea"]),
            int(totals["er"]),
            totals["na"] / num_intervals,
            totals["ea"] / num_intervals,
            int(peak["node_count"]), int(peak["edge_count"]),
            str(peak["snapshot_date"]),
            int(stable_node_count), int(stable_edge_count),
            (
                (totals["na"] + totals["nr"]) / final_nodes
                if final_nodes else 0.0
            ),
            (
                (totals["ea"] + totals["er"]) / final_edges
                if final_edges else 0.0
            ),
        )],
        "total_nodes_added long, total_nodes_removed long, "
        "total_edges_added long, total_edges_removed long, "
        "node_growth_rate double, edge_growth_rate double, "
        "peak_node_count long, peak_edge_count long, "
        "peak_date string, stable_node_count long, "
        "stable_edge_count long, node_churn_rate double, "
        "edge_churn_rate double",
    )


def filter_graph_by_date_range(
    nodes: DataFrame,
    edges: DataFrame,
    min_date=None,
    max_date=None,
    node_ts: str = "created_at",
    edge_ts: str = "created_at",
) -> dict[str, DataFrame]:
    """filter_snapshot_by_date_range (:476-532): date-filter nodes,
    prune edges to surviving endpoints AND the edge's own date, plus the
    summary row with the reference's density quirk (denominator 1 when
    n ≤ 1)."""
    fn = nodes
    if min_date is not None:
        fn = fn.where(F.col(node_ts) >= F.lit(str(min_date)).cast("date"))
    if max_date is not None:
        fn = fn.where(F.col(node_ts) <= F.lit(str(max_date)).cast("date"))
    ids = fn.select(F.col("node_id").alias("_nid")).distinct()
    fe = (
        edges.join(ids, edges["source"] == F.col("_nid"), "left_semi")
        .join(ids, edges["target"] == F.col("_nid"), "left_semi")
    )
    if min_date is not None:
        fe = fe.where(F.col(edge_ts) >= F.lit(str(min_date)).cast("date"))
    if max_date is not None:
        fe = fe.where(F.col(edge_ts) <= F.lit(str(max_date)).cast("date"))
    counts = fn.agg(F.count(F.lit(1)).alias("n")).withColumn(
        "_k", F.lit(1)
    ).join(
        fe.agg(F.count(F.lit(1)).alias("e")).withColumn("_k", F.lit(1)),
        "_k",
    )
    summary = counts.select(
        F.col("n").cast("long").alias("node_count"),
        F.col("e").cast("long").alias("edge_count"),
        (
            F.col("e")
            / F.when(
                F.col("n") > 1, F.col("n") * (F.col("n") - 1) / 2
            ).otherwise(F.lit(1.0))
        ).alias("density"),
    )
    return {"nodes": fn, "edges": fe, "summary": summary}
