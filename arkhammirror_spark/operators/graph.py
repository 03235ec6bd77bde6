"""Graph analytics over the co-mention edge table.

Reference lineage: arkham-shard-graph/arkham_shard_graph/algorithms.py
(pure-Python in-memory adjacency: degree :398, PageRank :496, connected
components :1025, shortest path :31, clustering :996). The reference caps
graphs at 500 nodes / 1000 edges (builder.py:166,264), so driver-side
computation over the collected edge list is proportionate; for
beyond-memory graphs, `connected_components_distributed` provides the
iterative min-label-propagation (hash-join per round, AQE-planned) that
scales with the cluster.
"""

from __future__ import annotations

from collections import defaultdict, deque

from pyspark.sql import DataFrame, functions as F


# ----------------------------- driver-side (≤ reference caps) --------------


def _adjacency(edge_rows) -> dict[str, set[str]]:
    adj: dict[str, set[str]] = defaultdict(set)
    for r in edge_rows:
        adj[r["entity_a"]].add(r["entity_b"])
        adj[r["entity_b"]].add(r["entity_a"])
    return adj


def degree_centrality(edges: DataFrame) -> dict[str, float]:
    """Normalized degree (algorithms.py:398-434)."""
    adj = _adjacency(edges.collect())
    n = len(adj)
    if n <= 1:
        return {k: 0.0 for k in adj}
    return {k: len(v) / (n - 1) for k, v in adj.items()}


def pagerank(
    edges: DataFrame, damping: float = 0.85, iterations: int = 20
) -> dict[str, float]:
    """Power iteration on the undirected co-mention graph (algorithms.py:496)."""
    adj = _adjacency(edges.collect())
    n = len(adj)
    if n == 0:
        return {}
    rank = {k: 1.0 / n for k in adj}
    for _ in range(iterations):
        nxt = {}
        for node in adj:
            incoming = sum(rank[nb] / len(adj[nb]) for nb in adj[node])
            nxt[node] = (1 - damping) / n + damping * incoming
        rank = nxt
    return rank


def connected_components(edges: DataFrame) -> dict[str, int]:
    """Union-find components (algorithms.py:1025)."""
    adj = _adjacency(edges.collect())
    comp: dict[str, int] = {}
    cid = 0
    for start in adj:
        if start in comp:
            continue
        queue = deque([start])
        while queue:
            node = queue.popleft()
            if node in comp:
                continue
            comp[node] = cid
            queue.extend(adj[node] - comp.keys())
        cid += 1
    return comp


def shortest_path(edges: DataFrame, src: str, dst: str) -> list[str] | None:
    """Unweighted BFS path (algorithms.py:31-85)."""
    adj = _adjacency(edges.collect())
    if src not in adj:
        return None
    prev: dict[str, str] = {src: src}
    queue = deque([src])
    while queue:
        node = queue.popleft()
        if node == dst:
            path = [node]
            while node != src:
                node = prev[node]
                path.append(node)
            return path[::-1]
        for nb in adj[node]:
            if nb not in prev:
                prev[nb] = node
                queue.append(nb)
    return None


def ego_network(edges: DataFrame, center: str, depth: int = 1) -> DataFrame:
    """BFS ego-subgraph (builder.py:549-619) as iterative DataFrame filters."""
    frontier = {center}
    seen = {center}
    for _ in range(depth):
        rows = edges.where(
            F.col("entity_a").isin(*frontier) | F.col("entity_b").isin(*frontier)
        ).collect()
        nxt = set()
        for r in rows:
            nxt.add(r["entity_a"])
            nxt.add(r["entity_b"])
        frontier = nxt - seen
        seen |= nxt
        if not frontier:
            break
    return edges.where(
        F.col("entity_a").isin(*seen) & F.col("entity_b").isin(*seen)
    )


# ----------------------------- distributed (beyond reference caps) ---------


def graph_statistics(edges: DataFrame) -> DataFrame:
    """Whole-graph statistics (algorithms.py:707-760): node count, edge
    count, density 2E/(N(N−1)), average degree 2E/N — one aggregation, no
    collect, so it holds at any graph size."""
    nodes = (
        edges.select(F.col("entity_a").alias("name"))
        .unionAll(edges.select(F.col("entity_b").alias("name")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_nodes.crossJoin(n_edges)
        .select(
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("n_edges").cast("long").alias("n_edges"),
            F.when(
                F.col("n_nodes") > 1,
                2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
            ).otherwise(0.0).alias("density"),
            F.when(F.col("n_nodes") > 0, 2.0 * F.col("n_edges") / F.col("n_nodes"))
            .otherwise(0.0)
            .alias("avg_degree"),
        )
    )


def pagerank_distributed(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 20,
    quantize: int | None = None,
) -> DataFrame:
    """Distributed power iteration on the undirected co-mention graph —
    the DataFrame sibling of `pagerank` (algorithms.py:496 semantics:
    r(v) = (1−d)/n + d·Σ_{u∈N(v)} r(u)/deg(u)), for graphs beyond the
    reference's 500-node cap. One join + agg per iteration; the symmetric
    edge list is the only reused frame (slim: two string columns).
    Returns (name, rank).

    quantize=D switches each iteration to FIXED-POINT arithmetic: ranks are
    held as floor(rank·10^D + 0.5) BIGINTs, per-edge contributions are
    integer-divided by degree, and the incoming sum is an exact integer sum
    — order-independent, so the result is bit-identical across partition
    counts / engines (a float Σ rank/deg is partition-order-dependent at the
    last ulp, which can flip a round(…, 6) comparison). The quantization
    error is ≤ deg·10⁻ᴰ per node per iteration — invisible at D=12 when the
    comparison precision is 6 digits.
    """
    sym = (
        edges.select(F.col("entity_a").alias("src"), F.col("entity_b").alias("dst"))
        .unionAll(
            edges.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    if n == 0:
        sym.unpersist()
        return edges.sparkSession.createDataFrame([], "name string, rank double")
    ranks = deg.select(
        F.col("src").alias("name"), F.lit(1.0 / n).alias("rank"), "deg"
    )
    scale = None if quantize is None else 10**quantize
    if scale is not None:
        ranks = ranks.withColumn(
            "r_int", F.floor(F.col("rank") * F.lit(float(scale)) + 0.5)
        )
    for _ in range(iterations):
        if scale is None:
            contrib_col = (F.col("rank") / F.col("deg")).alias("c")
        else:
            # BIGINT div BIGINT (both positive → truncate ≡ floor, matching
            # DuckDB's //); the downstream SUM is over exact integers
            contrib_col = F.expr("r_int div deg").alias("c")
        contrib = (
            sym.join(ranks, sym.src == ranks.name)
            .select(F.col("dst"), contrib_col)
            .groupBy("dst")
            .agg(F.sum("c").alias("incoming"))
        )
        if scale is None:
            rank_col = (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))
            ).alias("rank")
        else:
            rank_col = (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (
                    F.coalesce(F.col("incoming"), F.lit(0)).cast("double")
                    / F.lit(float(scale))
                )
            ).alias("rank")
        ranks = deg.join(contrib, deg.src == contrib.dst, "left").select(
            F.col("src").alias("name"), rank_col, "deg"
        )
        if scale is not None:
            ranks = ranks.withColumn(
                "r_int", F.floor(F.col("rank") * F.lit(float(scale)) + 0.5)
            )
        # truncate lineage per round (see connected_components_distributed)
        ranks = ranks.localCheckpoint(eager=True)
    out = ranks.select("name", "rank")
    sym.unpersist()
    return out


def betweenness_distributed(
    edges: DataFrame,
    limit: int = 50,
    sample_sources: int | None = None,
    seed: int = 7,
    edge_cap: int = 10_000_000,
    auto_sample_above: int = 4096,
) -> DataFrame:
    """Source-parallel betweenness for graphs beyond the reference's
    500-node driver cap (builder.py:166) — the distributed sibling of
    graph_algorithms.betweenness_centrality, same per-source semantics.

    Decomposition: per-source shortest-path-transit counting is independent
    across sources, so the adjacency (slim: string pairs) is broadcast once
    and the SOURCE list is what distributes — each task runs the exact
    reference enumeration (graph_algorithms._shortest_path_transits) for
    its sources, partial (node, count) rows reduce map-side. Exact when
    sample_sources is None; with sampling it is the Brandes–Pich style
    estimator (scores scaled by n/|S|). Fits graphs up to executor memory
    (~10⁷ edges) — far past the reference cap, though not the edge-table
    scale that CC/PageRank's join-per-round forms handle.

    Rank ties break lexicographically by node (deterministic under any
    partitioning; the driver-side sibling uses accumulation order).
    Returns (node, score, rank) for the top `limit`.

    Ceilings (enforced, not advisory): the edge count is measured FIRST and
    anything above `edge_cap` raises before a single row reaches the driver
    — the adjacency build is what bounds this form, and past it the
    join-per-round shapes (connected_components_distributed /
    pagerank_distributed) are the right tool. Graphs with more than
    `auto_sample_above` nodes and no explicit `sample_sources` switch to
    the Brandes–Pich sampled estimator automatically (exact per-source BFS
    over every source is O(n·m) — quadratic-ish compute long before memory
    hurts). The adjacency streams in via toLocalIterator (no second row
    list) and the result is materialized eagerly so the broadcast can be
    destroyed before returning (each call previously leaked one broadcast
    for the session lifetime).
    """
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..shipping import ensure_shipped
    from .graph_algorithms import _shortest_path_transits

    spark = edges.sparkSession
    ensure_shipped(spark)
    slim = edges.select("entity_a", "entity_b")
    n_edges = slim.count()
    if n_edges > edge_cap:
        raise ValueError(
            f"betweenness_distributed: {n_edges} edges exceeds edge_cap="
            f"{edge_cap}; the broadcast-adjacency form is memory-bound — use "
            "connected_components_distributed / pagerank_distributed style "
            "join-per-round analytics or raise edge_cap explicitly."
        )
    adj: dict[str, list[str]] = {}
    nodes: list[str] = []
    seen: set[str] = set()
    # collect() is BOUNDED here (the edge_cap gate above already counted);
    # toLocalIterator would pay one job round-trip per partition for the
    # same rows (measured 5x slower on fixture graphs)
    for r in slim.collect():
        a, b = r["entity_a"], r["entity_b"]
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
        for v in (a, b):
            if v not in seen:
                seen.add(v)
                nodes.append(v)
    n = len(nodes)
    if n == 0:
        return spark.createDataFrame([], "node string, score double, rank int")

    if sample_sources is None and n > auto_sample_above:
        sample_sources = auto_sample_above
    sources = nodes
    scale = 1.0
    if sample_sources is not None and sample_sources < n:
        import random

        sources = random.Random(seed).sample(nodes, sample_sources)
        scale = n / sample_sources

    bc = spark.sparkContext.broadcast((adj, nodes))

    src_df = spark.createDataFrame([(s,) for s in sources], "src string")
    parallelism = min(len(sources), spark.sparkContext.defaultParallelism)
    src_df = src_df.repartition(parallelism)

    out_schema = StructType(
        [StructField("node", StringType(), False),
         StructField("cnt", LongType(), False)]
    )

    def _run(batches):
        import pandas as pd_  # executor-side

        adj_b, nodes_b = bc.value
        for pdf in batches:
            acc: dict[str, int] = {}
            for src in pdf["src"].tolist():
                for node, c in _shortest_path_transits(adj_b, src, nodes_b).items():
                    acc[node] = acc.get(node, 0) + c
            yield pd_.DataFrame(
                {"node": list(acc.keys()), "cnt": list(acc.values())},
                columns=["node", "cnt"],
            )

    norm = (n - 1) * (n - 2) / 2 if n > 2 else 1
    scored = (
        src_df.mapInPandas(_run, out_schema)
        .groupBy("node")
        .agg(F.sum("cnt").alias("cnt"))
        .select(
            "node",
            (F.col("cnt") * F.lit(scale) / F.lit(float(norm))).alias("score"),
        )
    )
    # Top-`limit` via distributed TakeOrderedAndProject (no unpartitioned
    # row_number window over all nodes); ranks are assigned on the driver
    # over the ≤limit collected rows (this is already a driver-capped lane
    # — the whole adjacency was collected above). Materializing through
    # createDataFrame also frees the broadcast immediately, as before.
    top = (
        scored.orderBy(F.desc("score"), F.asc("node")).limit(limit).collect()
    )
    bc.destroy()
    return spark.createDataFrame(
        [(r["node"], r["score"], i + 1) for i, r in enumerate(top)],
        "node string, score double, rank int",
    )


def label_propagation_communities(
    edges: DataFrame, max_iterations: int = 20, weight_col: str | None = None
) -> DataFrame:
    """Distributed community detection for graphs beyond the reference's
    500-node cap — the scale sibling of `graph_algorithms.
    louvain_communities`. Louvain's local-moving is inherently sequential
    (node-by-node moves over an in-memory graph), so the distributed lane
    uses synchronous WEIGHTED LABEL PROPAGATION: each round every node
    adopts the label with the greatest incident edge-weight sum among its
    neighbours' labels ∪ its own label (self counted with weight 1 — the
    standard damping that stops two-node oscillation), ties broken to the
    smaller label, so the result is deterministic under any partitioning.
    One join + agg per round, per-round localCheckpoint (lineage rule).

    Semantics note: LPA optimizes local label agreement, not modularity —
    parity with the reference Louvain is NOT claimed (and is impossible to
    pin: Louvain's result depends on its sequential visit order). Converges
    on no-change; the cap is the standard LPA remedy for rare oscillation
    and capping out returns the current labels (heuristic contract, unlike
    connected_components_distributed whose labels must be exact).
    Returns (name, community).
    """
    from pyspark.sql import Window

    w_expr = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    sym = (
        edges.select(
            F.col("entity_a").alias("src"), F.col("entity_b").alias("dst"),
            w_expr.alias("w"),
        )
        .unionAll(
            edges.select(
                F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"),
                w_expr.alias("w"),
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )

    # Adaptive small-graph fast path (same shape as
    # connected_components_distributed's): bounded graphs pay only fixed
    # per-round scheduling in the distributed loop, so emulate the EXACT
    # synchronous min-tie weighted LPA on the driver. The update rule is
    # deterministic under any partitioning, and for integer-valued weights
    # (including the unweighted w=1 contract path) the per-label sums are
    # exact in float regardless of addition order, so labels are identical
    # to the distributed loop's.
    driver_cap = 100_000
    head = sym.limit(driver_cap + 1).collect()
    if len(head) <= driver_cap:
        adj: dict[str, dict[str, float]] = {}
        for r in head:
            adj.setdefault(r["src"], {})[r["dst"]] = r["w"]
        labels_d = {n: n for n in adj}
        for _ in range(max_iterations):
            new_labels = {}
            changed = 0
            for n, nbrs in adj.items():
                scores: dict[str, float] = {labels_d[n]: 1.0}
                for m, w in nbrs.items():
                    lm = labels_d[m]
                    scores[lm] = scores.get(lm, 0.0) + w
                best = min(
                    scores, key=lambda lbl: (-scores[lbl], lbl)
                )
                new_labels[n] = best
                if best != labels_d[n]:
                    changed += 1
            labels_d = new_labels
            if changed == 0:
                break
        return edges.sparkSession.createDataFrame(
            sorted(labels_d.items()), "name string, community string"
        )

    sym = sym.persist()
    labels = sym.select(F.col("src").alias("name")).distinct().withColumn(
        "community", F.col("name")
    )
    win = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("community"))
    win_all = Window.partitionBy("src")
    for _ in range(max_iterations):
        # One fused round: the self row (weight-1 damping) doubles as the
        # carrier of the PREVIOUS label — `is_self` survives the groupBy as
        # a max flag, and a same-partition window recovers prev per node, so
        # convergence needs no join back onto the old labels. The lazy
        # localCheckpoint is materialized BY the convergence count: one
        # Spark job per round total (was 2 jobs + an extra shuffle join).
        neighbor = (
            sym.join(labels, sym.dst == labels.name)
            .select("src", "community", "w", F.lit(0).alias("is_self"))
        )
        self_rows = labels.select(
            F.col("name").alias("src"), "community", F.lit(1.0).alias("w"),
            F.lit(1).alias("is_self"),
        )
        scores = (
            neighbor.unionByName(self_rows)
            .groupBy("src", "community")
            .agg(F.sum("w").alias("s"), F.max("is_self").alias("self_flag"))
        )
        updated = (
            scores.withColumn(
                "prev",
                F.max(F.when(F.col("self_flag") == 1, F.col("community"))).over(
                    win_all
                ),
            )
            .withColumn("_rk", F.row_number().over(win))
            .where(F.col("_rk") == 1)
            .select(F.col("src").alias("name"), "community", "prev")
            .localCheckpoint(eager=False)  # truncate per-round lineage
        )
        changed = updated.where(F.col("community") != F.col("prev")).count()
        labels = updated.select("name", "community")
        if changed == 0:
            break
    sym.unpersist()
    return labels


def connected_components_distributed(
    edges: DataFrame,
    max_iterations: int = 50,
    require_convergence: bool = True,
    driver_cap: int | None = 100_000,
) -> DataFrame:
    """Min-label propagation over (node, component) frames.

    Each round: component := min(component over neighbors ∪ self); converges
    in O(diameter) rounds. The loop runs UNTIL the changed-count reaches 0 —
    max_iterations is a safety cap, and exhausting it without convergence
    raises (require_convergence=True, default) rather than silently
    returning partially-propagated labels: a long-chain component deeper
    than the cap would otherwise produce wrong components that no downstream
    check can see. Pure DataFrame joins → scales with the cluster
    (what the reference cannot do beyond one process's memory).
    Returns (name, component) where component is the lexicographic min name
    reachable.

    Adaptive small-graph fast path (the broadcast-join-threshold idea):
    when the DISTINCT edge set fits under `driver_cap`, min-label rounds
    pay only fixed per-stage scheduling cost — ~0.6 s/round × O(log d)
    rounds for a 2k-edge graph — so the components are computed by driver
    union-find instead. `limit(cap+1).collect()` both decides and fetches
    in ONE job: if the cap is not exceeded those rows ARE the whole graph.
    Labels are identical (min member per component, same string ordering);
    graphs above the cap take the distributed loop unchanged. Set
    driver_cap=None to force the distributed path.
    """
    if driver_cap is not None:
        # self-loop rows (a == b) are kept: they seed their node into
        # parent{} as its own component, matching the distributed path
        # (where min over neighbors ∪ self keeps such nodes) — filtering
        # them out would make the output depend on which path ran
        # slim (a, b) checkpoint BEFORE the cap probe: limit().collect()
        # executes incrementally (1, 4, 16 … partitions per attempt) and
        # each attempt would otherwise recompute the whole upstream
        # (NER + comention) lineage — measured ~1.7× the full input cost.
        # Two string columns per distinct edge, invariant-5-slim.
        dedup_edges = edges.select(
            F.least("entity_a", "entity_b").alias("a"),
            F.greatest("entity_a", "entity_b").alias("b"),
        ).distinct().localCheckpoint(eager=True)
        head = dedup_edges.limit(driver_cap + 1).collect()
        if len(head) <= driver_cap:
            parent: dict[str, str] = {}

            def find(x: str) -> str:
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in head:
                a, b = row["a"], row["b"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                if a == b:
                    continue
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
            comp_min: dict[str, str] = {}
            for n in parent:
                r = find(n)
                if r not in comp_min or n < comp_min[r]:
                    comp_min[r] = n
            out = [(n, comp_min[find(n)]) for n in parent]
            return edges.sparkSession.createDataFrame(
                out, "name string, component string"
            )

    sym = (
        edges.select(F.col("entity_a").alias("src"), F.col("entity_b").alias("dst"))
        .unionAll(
            edges.select(F.col("entity_b").alias("src"), F.col("entity_a").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("src").alias("name")).distinct().withColumn(
        "component", F.col("name")
    )
    converged = False
    for _ in range(max_iterations):
        # Fused round: each node's new label is min(own ∪ neighbors'); the
        # self contribution rides the same groupBy tagged is_self so the OLD
        # label comes out of the aggregate (max over the when() keeps the
        # single self row), and convergence is a plain filter-count on the
        # round's result — no join back onto the previous labels. The
        # localCheckpoint is LAZY and is materialized by that same count:
        # one Spark job and two shuffles per round (the eager-checkpoint +
        # join-based check shape cost two jobs and four shuffles, ~12s of
        # fixed overhead across the rounds of a sf0.1 duplicate-groups run).
        # localCheckpoint also truncates the logical plan each round:
        # without it the lineage (and Catalyst planning time) grows
        # exponentially with iterations — the printed plan at 15 rounds held
        # >150 copies of the upstream subtree. On a cluster, set a
        # checkpoint dir and swap for .checkpoint() to also survive
        # executor loss.
        msgs = (
            sym.join(labels, sym.dst == labels.name)
            .select("src", "component", F.lit(0).alias("is_self"))
            .unionByName(
                labels.select(
                    F.col("name").alias("src"), "component",
                    F.lit(1).alias("is_self"),
                )
            )
        )
        upd = (
            msgs.groupBy("src")
            .agg(
                F.min("component").alias("component"),
                F.max(F.when(F.col("is_self") == 1, F.col("component"))).alias(
                    "prev"
                ),
            )
            .select(F.col("src").alias("name"), "component", "prev")
            .localCheckpoint(eager=False)  # read twice by the shortcut join
        )
        # Pointer-doubling shortcut: component := component-of-component
        # (this round's own labels as the lookup side — the lazy
        # checkpoint above makes the self-join read the aggregate once).
        # Effective reach
        # doubles per round, so chains converge in O(log diameter) rounds
        # instead of O(diameter) — measured 11 rounds -> 4 on the sf0.1
        # duplicate-groups fixture. component(y) <= y under min-label, so
        # the shortcut only ever lowers labels; the fixpoint (changed=0)
        # is the same connected-component minimum.
        look = upd.select(
            F.col("name").alias("c_name"), F.col("component").alias("c_comp")
        )
        updated = (
            upd.join(look, upd.component == look.c_name, "left")
            .select(
                "name",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("c_comp"), F.col("component")),
                ).alias("component"),
                "prev",
            )
            .localCheckpoint(eager=False)
        )
        changed = updated.where(F.col("component") != F.col("prev")).count()
        labels = updated.select("name", "component")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged and require_convergence:
        raise RuntimeError(
            f"connected_components_distributed did not converge within "
            f"{max_iterations} iterations (graph diameter exceeds the cap); "
            f"raise max_iterations or pass require_convergence=False"
        )
    return labels


def filter_graph(
    nodes: DataFrame,
    edges: DataFrame,
    entity_types: list[str] | None = None,
    min_degree: int | None = None,
    min_edge_weight: float | None = None,
    relationship_types: list[str] | None = None,
    document_ids: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Multi-criteria graph filter (builder.py:458-547), frame-native.

    Reference order preserved: node filters run against the STORED
    degree (pre-filter), edges keep only pairs whose BOTH endpoints
    survive, then weight / relationship-type / document-id (any-overlap)
    filters, then degrees are recomputed over the filtered edges and
    isolated nodes dropped. nodes: (id, label, entity_type, degree[,
    ...]); edges: (source, target, relationship_type, weight[,
    document_ids array<string>, ...]). Every step is a column filter or
    an equi-join on the node id — no collect, holds at any graph size.
    Returns (filtered_nodes_with_recomputed_degree, filtered_edges)."""
    n = nodes
    if entity_types:
        n = n.where(F.col("entity_type").isin(*entity_types))
    if min_degree is not None:
        n = n.where(F.col("degree") >= min_degree)
    kept_ids = n.select(F.col("id").alias("_kid"))
    e = (
        edges.join(kept_ids, edges["source"] == F.col("_kid")).drop("_kid")
        .join(kept_ids, edges["target"] == F.col("_kid")).drop("_kid")
    )
    if min_edge_weight is not None:
        e = e.where(F.col("weight") >= min_edge_weight)
    if relationship_types:
        e = e.where(F.col("relationship_type").isin(*relationship_types))
    if document_ids and "document_ids" in edges.columns:
        e = e.where(
            F.arrays_overlap(
                F.col("document_ids"),
                F.array(*[F.lit(d) for d in document_ids]),
            )
        )
    ends = e.select(F.col("source").alias("id")).unionAll(
        e.select(F.col("target").alias("id"))
    )
    new_deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("_deg"))
    out_nodes = (
        n.drop("degree")
        .join(new_deg, "id")  # inner join drops isolated nodes
        .withColumnRenamed("_deg", "degree")
    )
    return out_nodes, e
