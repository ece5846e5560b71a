"""Distributed graph centrality: integer-arithmetic PageRank.

Companion to the min-label-propagation connected components in
`llm/dedup.py` — CC resolves WHICH documents form a duplicate cluster;
PageRank ranks nodes so a pipeline can pick the most-connected canonical
representative (or, on an event-transition graph, score user-journey
states).

Determinism doctrine (the k-means / quality-classifier trick applied to
graphs): ranks live as BIGINTs scaled by 10^12, every round is
  contrib(u->v) = rank[u] div deg[u]          (integer division)
  rank'[v]      = (0.15*SCALE div n) + (0.85 * insum[v]) div 100-style
                 integer ops — addition of BIGINTs is exact and
                 order-free, so there is NO float-accumulation-order
                 hazard anywhere and a DuckDB oracle replays all rounds
                 bit-exactly as unrolled materialized CTEs.

Scale shape: each round is one equi-join (rank × edges, both partitioned
by src) + one grouped BIGINT sum — the classic iterative-join PageRank;
rounds are fixed (power iteration converges geometrically at d=0.85), no
driver-side per-node state. The only collect() is the node count (one
scalar); the weighted variant's dangling mass stays IN the plan as a
1-row aggregate cross-joined back (no per-round driver action, no
re-execution of earlier rounds). Caching `edges`+`deg` keeps the scan
subtree from re-executing per round; both entry points finish with an
eager localCheckpoint of the O(nodes) result and unpersist their caches
so a long catalog sweep doesn't accumulate executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # rank fixed-point scale; sum(rank) ~ SCALE << BIGINT max
PR_DAMP_NUM = 85  # d = 0.85 as the exact rational 85/100
PR_BASE_NUM = PR_SCALE * (100 - PR_DAMP_NUM) // 100  # (1-d)*SCALE, exact


def pagerank(
    pairs: DataFrame,
    rounds: int = 5,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank over an undirected pair list (each pair symmetrized).

    Returns (node, degree, rank) with rank the BIGINT fixed-point value
    after `rounds` power iterations from the uniform start. All nodes
    come from the pair list, so degree >= 1 and no dangling-mass term is
    needed; integer truncation leaks a deterministic whisker of mass per
    round (documented, replayed identically by the oracle).
    """
    a = pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # r16 (guide §2.4): hash-partition the cached edge list by the
    # per-round join key ONCE. Every iteration joins rank × edges on
    # src; an unpartitioned cache re-shuffles the edge list (the
    # loop's biggest frame) every round once ranks outgrow broadcast,
    # while a HashPartitioning(src) cache satisfies the join's
    # distribution for all `rounds` iterations — and the degree
    # aggregate below reuses the same partitioning (zero exchanges).
    # Cost: one narrow (src, dst) shuffle at build.
    edges = (
        a.unionByName(a.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .cache()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree")).cache()
    n = deg.count()  # single scalar; the one driver-side value
    if n == 0:
        out = deg.select(
            F.col("src").alias("node"),
            "degree",
            F.lit(0).cast("bigint").alias("rank"),
        ).localCheckpoint(eager=True)
        edges.unpersist()
        deg.unpersist()
        return out
    base = PR_BASE_NUM // n
    r = deg.select(
        F.col("src").alias("node"),
        "degree",
        F.lit(PR_SCALE // n).cast("bigint").alias("rank"),
    )
    for i in range(rounds):
        # Iterative DataFrame loops grow the logical plan linearly; past
        # a handful of rounds Catalyst re-analysis dominates. Truncate
        # lineage periodically — the rank frame is O(nodes), cheap to
        # materialize, and the loop then scales to any round count.
        if i and i % checkpoint_every == 0:
            r = r.localCheckpoint(eager=True)
        insum = (
            r.join(edges, r["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div degree").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("insum"))
        )
        r = (
            deg.join(insum, deg["src"] == insum["node"], "left")
            .select(
                deg["src"].alias("node"),
                "degree",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(insum, 0L)) div 100"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
    # Materialize the O(nodes) result once, then release the cached scan
    # subtrees — the checkpointed frame no longer references them, so a
    # catalog sweep of many graph entries doesn't pile up executor memory.
    r = r.localCheckpoint(eager=True)
    edges.unpersist()
    deg.unpersist()
    return r


def pagerank_weighted(
    edges: DataFrame,
    rounds: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Directed WEIGHTED PageRank with uniform dangling-mass
    redistribution — the Markov-steady-state shape for transition
    graphs (event-type journey flow, link graphs with click counts).

    Same integer doctrine as `pagerank`: contrib(u->v) =
    (rank[u] * w(u,v)) div outw[u]; a node with no outgoing edges is
    DANGLING — its whole rank joins a per-round 1-row aggregate and
    redistributes uniformly as dang_mass div n to every node (the
    standard stochastic-matrix patch), keeping total mass conserved up
    to deterministic truncation. The dangling sum stays IN the plan as
    a broadcast 1-row cross join (`dang div n` is integer division on
    non-negative BIGINTs, identical to the oracle's per-round CTE scalar)
    — no per-round driver collect. Because the rank update then branches
    on r TWICE (dangling agg + contribution join), r is eagerly
    localCheckpoint'ed each round: without that the logical plan doubles
    per round (2^rounds analysis blowup); with it each round is one tiny
    O(nodes) job and the loop is linear in `rounds`.

    Overflow note: rank*w <= 10^12 * w must stay under 2^63; for
    weights beyond ~9*10^6 split via the exact identity
    (a*w) div b = (a div b)*w + ((a mod b)*w) div b.
    """
    # r16: same per-round join-key partitioning as `pagerank` — the
    # contribution join and the outw aggregate are both keyed on src.
    e = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(weight_col).cast("bigint").alias("w"),
        )
        .repartition("src")
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        out = nodes.withColumn("rank", F.lit(0).cast("bigint"))
        out = out.localCheckpoint(eager=True)
        e.unpersist()
        nodes.unpersist()
        return out
    outw = e.groupBy("src").agg(F.sum("w").alias("outw")).cache()
    base = PR_BASE_NUM // n
    r = nodes.withColumn("rank", F.lit(PR_SCALE // n).cast("bigint"))
    for i in range(rounds):
        # Per-round truncation is mandatory here (not just a depth
        # optimization as in `pagerank`): r feeds BOTH the dangling agg
        # and the contribution join below, so an un-truncated plan
        # doubles in size every round.
        if i:
            r = r.localCheckpoint(eager=True)
        rr = r.join(outw, r["node"] == outw["src"], "left").select(
            "node", "rank", "outw"
        )
        dang = rr.where(F.col("outw").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("bigint").alias("dang")
        )
        contrib = (
            rr.where(F.col("outw").isNotNull())
            .join(e, rr["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(rank * w) div outw").alias("contrib"),
            )
        )
        insum = contrib.groupBy("node").agg(F.sum("contrib").alias("insum"))
        r = (
            nodes.join(insum, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * (coalesce(insum, 0L)"
                        f" + dang div {n}L)) div 100"
                    )
                ).cast("bigint").alias("rank"),
            )
        )
    r = r.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    outw.unpersist()
    return r


def canonical_edges(
    pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Canonical undirected edge list (a < b, self-loops dropped,
    deduplicated) — the shared input shape for the triangle family."""
    return (
        pairs.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") < F.col("b"))
        .distinct()
    )


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def _orient(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree-ordered orientation (u, v, dv): every edge points from the
    lower (degree, id)-rank endpoint to the higher, carrying the dst's
    degree for the wedge ordering."""
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )


def _oriented_triangles(orient: DataFrame) -> DataFrame:
    """(x, y, z) triangle rows, each triangle exactly once (rank
    x < y < z): wedge join on the oriented source + closing join."""
    e1, e2, e3 = orient.alias("e1"), orient.alias("e2"), orient.alias("e3")
    wedge_order = (F.col("e1.dv") < F.col("e2.dv")) | (
        (F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v"))
    )
    return (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & wedge_order)
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )


def triangle_count(
    pairs: DataFrame, src_col: str = "id_a", dst_col: str = "id_b"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected pair list — the classic bucketed-join graph op that
    complements PageRank/CC on the near-dup graph (a dup CLUSTER is a
    clique: high coefficient; a chain of borderline matches is not).

    Algorithm (Schank & Wagner '05 / the standard MapReduce variant):
    orient every edge from the lower-rank to the higher-rank endpoint,
    rank = (degree, node id) lexicographic. Orientation bounds out-degree
    by O(sqrt(m)) — the high-degree hub that would explode a naive wedge
    join only ever RECEIVES oriented edges — so the wedge join (self-join
    of oriented edges on src, ordered dst pair) and the closing join (is
    the wedge's far pair itself an oriented edge?) shuffle skew-free.
    Each triangle {x,y,z} with rank x<y<z appears exactly once: as wedge
    (y,z) at x closed by oriented edge y→z.

    Everything is integer joins + counts; the only float is the final
    coefficient 2*T/(deg*(deg-1)) on already-deterministic integers —
    a DuckDB oracle replays it bit-exactly as a 3-way self-join.
    """
    # Same up-front materialization as `ktruss`: und feeds the degree
    # agg, both orientation joins, and the final per-node join — an
    # expensive verified-pair input subtree must execute once.
    und = canonical_edges(pairs, src_col, dst_col).localCheckpoint(eager=True)
    deg = _degrees(und).cache()
    orient = _orient(und, deg).cache()
    tri = _oriented_triangles(orient)
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionByName(tri.select(F.col("y").alias("node")))
        .unionByName(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    out = (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("degree").cast("bigint").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce(F.col("n_triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
        .localCheckpoint(eager=True)
    )
    deg.unpersist()
    orient.unpersist()
    return out


def edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical edge list:
    (a, b, support) where support = number of triangles containing the
    edge. Each (x,y,z) triangle row contributes to its three edges —
    already canonical because rank order within a triangle preserves no
    id order, so least/greatest re-canonicalizes. Support is the
    k-truss peeling quantity (Cohen '08)."""
    deg = _degrees(und)
    tri = _oriented_triangles(_orient(und, deg))
    sides = None
    for p, q in (("x", "y"), ("x", "z"), ("y", "z")):
        s = tri.select(
            F.least(F.col(p), F.col(q)).alias("a"),
            F.greatest(F.col(p), F.col(q)).alias("b"),
        )
        sides = s if sides is None else sides.unionByName(s)
    sup = sides.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return und.join(sup, ["a", "b"], "left").select(
        "a",
        "b",
        F.coalesce(F.col("support"), F.lit(0)).cast("bigint").alias("support"),
    )


def ktruss(
    pairs: DataFrame,
    k: int = 3,
    rounds: int = 2,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """k-truss peeling, `rounds` fixed iterations: repeatedly drop every
    edge in fewer than k-2 triangles, then annotate the survivors with
    their support recomputed on the final edge set — the dup-cluster
    robustness filter (a true duplicate CLUSTER is a clique and survives;
    a chain of borderline pairwise matches has support 0 and peels away).

    Fixed rounds, not run-to-fixpoint, so a DuckDB oracle replays every
    round as unrolled CTEs (the PageRank doctrine); peeling converges in
    O(max-support) rounds and for k=3 a single round suffices (removing
    support-0 edges can't reduce any other edge's support — triangles
    only contain support>=1 edges), with round 2 pinning the fixpoint.
    Per-round eager localCheckpoint: the edge set is O(m) and the
    support subtree branches it several ways.
    """
    t = k - 2
    # Materialize the canonical edge list up front: edge_support branches
    # its input several ways (degrees, both orientation joins, the
    # support left-join), and the input here is typically an expensive
    # verified-pair subtree (minhash + LSH + verify) that must execute
    # once, not once per branch.
    e = canonical_edges(pairs, src_col, dst_col).localCheckpoint(eager=True)
    # r16 (guide §1.2 "don't compute things you throw away"): for
    # t <= 1 the peeling fixpoint is reached after ONE support pass, so
    # one triangle enumeration replaces rounds+1 of them. Proof: an
    # edge removed in round 1 has support < t <= 1, i.e. support 0 — it
    # belongs to NO triangle, so removing it destroys no triangle and
    # every surviving edge's support is unchanged; rounds 2..n remove
    # nothing and the final annotate pass recomputes the identical
    # supports. (For t = 0 no edge is ever removed and the filter is a
    # no-op — same identity.) Hence the output — including the support
    # column — equals the first pass filtered once. k=3 (t=1) is the
    # catalog's 3-truss entry: this cuts its 3 triangle enumerations
    # (2 peel rounds + annotate) to 1, oracle-hash-verified at 3 SFs.
    # t >= 2 peeling can cascade, so the general loop stays.
    if t <= 1 and rounds >= 1:
        return (
            edge_support(e)
            .where(F.col("support") >= t)
            .localCheckpoint(eager=True)
        )
    for _ in range(rounds):
        e = (
            edge_support(e)
            .where(F.col("support") >= t)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return edge_support(e).localCheckpoint(eager=True)


def kcore(
    pairs: DataFrame,
    k: int = 2,
    rounds: int = 3,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """k-core peeling, `rounds` fixed iterations: repeatedly drop every
    NODE of degree < k (and its edges), then report the survivors as
    (node, degree, core_degree) — full-graph degree next to the degree
    inside the surviving subgraph. The node-granular sibling of `ktruss`
    (Seidman '83): a duplicate cluster is a clique, so its members all
    sit in a high core; pendant chains of borderline matches peel away
    one endpoint per round.

    Fixed rounds, not run-to-fixpoint, so a DuckDB oracle replays every
    round as unrolled CTEs (the PageRank doctrine). Each round is one
    degree aggregate + two semi-joins on the O(m) checkpointed edge
    list — no driver-side state, no skew hazard (the semi-join keys are
    node ids, salt-free because degree tables are one row per node).
    Per-round eager localCheckpoint for the same reason as `ktruss`:
    the degree subtree branches the edge list, and the input pair
    subtree (minhash + LSH + verify) must execute once, not per round.
    """
    e = canonical_edges(pairs, src_col, dst_col).localCheckpoint(eager=True)
    deg_full = _degrees(e).localCheckpoint(eager=True)
    for _ in range(rounds):
        # Checkpoint the O(nodes) keep-list so the degree aggregate (an
        # O(m) shuffle) runs once per round, not once per semi-join side.
        keep = (
            _degrees(e)
            .where(F.col("degree") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
        e = (
            e.join(keep.select(F.col("node").alias("a")), "a", "semi")
            .join(keep.select(F.col("node").alias("b")), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    core_deg = _degrees(e).select(
        "node", F.col("degree").alias("core_degree")
    )
    return (
        deg_full.join(core_deg, "node")
        .select(
            "node",
            F.col("degree").cast("bigint").alias("degree"),
            F.col("core_degree").cast("bigint").alias("core_degree"),
        )
        .localCheckpoint(eager=True)
    )
