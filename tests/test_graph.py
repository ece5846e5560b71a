"""Integer PageRank (operators/graph.py): planted-structure checks —
hub dominance on a star, symmetry on a clique, mass conservation up to
the documented integer-truncation leak. The bit-exact cross-engine
replay is the oracle's job (graph_pagerank_dup_docs)."""

from __future__ import annotations

from data_pipeline_with_spark_spark.operators.graph import PR_SCALE, pagerank


def _pr(spark, pairs, rounds=5):
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    return {r.node: (r.degree, r.rank) for r in pagerank(df, rounds=rounds).collect()}


def test_star_hub_outranks_leaves(spark):
    # 0 at the center of a 6-leaf star: hub rank far above any leaf,
    # leaves all identical (exact integer arithmetic -> exactly equal).
    got = _pr(spark, [(0, i) for i in range(1, 7)])
    hub = got[0][1]
    leaves = {got[i][1] for i in range(1, 7)}
    assert len(leaves) == 1
    assert hub > 3 * leaves.pop()


def test_clique_is_uniform_and_conserves_mass(spark):
    n = 5
    got = _pr(spark, [(a, b) for a in range(n) for b in range(a + 1, n)])
    ranks = [v for _, v in got.values()]
    assert len(set(ranks)) == 1  # symmetry -> identical integer ranks
    total = sum(ranks)
    # mass conserved up to deterministic truncation leak (< n per round
    # per term; generous bound here).
    assert PR_SCALE * 0.99 < total <= PR_SCALE


def test_bridge_node_outranks_periphery(spark):
    # two triangles joined through node 2: the bridge gets extra mass.
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    got = _pr(spark, pairs)
    assert got[2][1] > got[0][1]
    assert got[2][0] == 4  # bridge degree


def test_weighted_pagerank_prefers_heavy_edge(spark):
    from data_pipeline_with_spark_spark.operators.graph import pagerank_weighted

    # 0 sends 9x more weight to 1 than to 2; both return all mass to 0.
    df = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (1, 0, 1), (2, 0, 1)], ["src", "dst", "w"]
    )
    got = {r.node: r.rank for r in pagerank_weighted(df, rounds=10).collect()}
    assert got[1] > 3 * got[2]
    assert got[0] > got[1]


def test_weighted_pagerank_dangling_mass_redistributes(spark):
    from data_pipeline_with_spark_spark.operators.graph import (
        PR_SCALE,
        pagerank_weighted,
    )

    # 2 is dangling (no outgoing edges): without redistribution its
    # inflow would drain from the system; with it, total mass stays
    # within the truncation leak and 2 still outranks the feeders'
    # uniform share (it receives from both 0 and 1).
    df = spark.createDataFrame(
        [(0, 2, 1), (1, 2, 1), (0, 1, 1), (1, 0, 1)], ["src", "dst", "w"]
    )
    rows = pagerank_weighted(df, rounds=10).collect()
    got = {r.node: r.rank for r in rows}
    total = sum(got.values())
    assert PR_SCALE * 0.98 < total <= PR_SCALE
    assert got[2] == max(got.values())


def test_triangle_count_planted_structures(spark):
    """K4 glued to a 2-path: every K4 node sits in C(3,2)=3 triangles
    with coefficient 1.0; the path tail has none. Edge direction/dupes
    in the input must not matter (canonicalization)."""
    from data_pipeline_with_spark_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    noisy = k4 + [(b, a) for a, b in k4[:2]] + [(3, 4), (4, 5)]  # dupes + path
    df = spark.createDataFrame(noisy, ["id_a", "id_b"])
    got = {r.node: r for r in triangle_count(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}
    for n in range(3):
        assert got[n].n_triangles == 3 and got[n].clustering_coeff == 1.0
    assert got[3].n_triangles == 3  # K4 member; extra path edge lowers coeff
    assert got[3].degree == 4 and abs(got[3].clustering_coeff - 0.5) < 1e-9
    assert got[4].n_triangles == 0 and got[4].clustering_coeff == 0.0
    assert got[5].n_triangles == 0 and got[5].degree == 1


def test_triangle_count_total_matches_naive(spark):
    """Sum of per-node counts = 3 * #triangles on a random-ish planted
    graph; cross-checked against the naive a<b<c triple join."""
    from pyspark.sql import functions as F

    from data_pipeline_with_spark_spark.operators.graph import triangle_count

    edges = [(a, b) for a in range(12) for b in range(a + 1, 12)
             if (a * 7 + b * 13) % 3 != 0]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    per_node_total = (
        triangle_count(df).agg(F.sum("n_triangles")).collect()[0][0]
    )
    e = spark.createDataFrame(edges, ["a", "b"])
    naive = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .count()
    )
    assert naive > 0
    assert per_node_total == 3 * naive


import pytest


@pytest.mark.slow
def test_pagerank_deep_rounds_flat_per_round_cost(spark):
    """Lineage stress (r10 verdict #7): on a 10×-fixture-scale synthetic
    graph, tripling the round count must not blow up per-round cost —
    the checkpoint cadence keeps Catalyst analysis flat instead of
    quadratic/exponential in depth. Wall-clock ratios on a shared box
    are noisy, so the bound is deliberately loose (3× work ⇒ <9× time);
    the real failure mode this guards (unbounded plan growth) is
    multiplicative, not marginal."""
    import time

    from data_pipeline_with_spark_spark.operators.graph import (
        pagerank,
        pagerank_weighted,
    )

    # ~5k nodes / ~15k undirected edges, deterministic pseudo-random.
    pairs = [
        (i, (i * 48271 + j * 16807) % 5000)
        for i in range(5000)
        for j in range(1, 4)
        if i != (i * 48271 + j * 16807) % 5000
    ]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"]).cache()
    df.count()

    t0 = time.time()
    pagerank(df, rounds=8).count()
    base = time.time() - t0
    t0 = time.time()
    deep = pagerank(df, rounds=24)
    assert deep.count() > 0
    deep_t = time.time() - t0
    assert deep_t < max(9 * base, base + 30), (base, deep_t)

    edges = df.selectExpr("id_a AS src", "id_b AS dst", "1 + id_a % 5 AS w")
    t0 = time.time()
    pagerank_weighted(edges, rounds=5).count()
    base_w = time.time() - t0
    t0 = time.time()
    deep_w = pagerank_weighted(edges, rounds=15)
    assert deep_w.count() > 0
    deep_w_t = time.time() - t0
    assert deep_w_t < max(9 * base_w, base_w + 30), (base_w, deep_w_t)
    df.unpersist()


def test_ktruss_peels_chains_keeps_cliques(spark):
    """3-truss on K4 + a pendant path: all six K4 edges survive with
    support 2 (each K4 edge sits in exactly 2 of the 4 triangles); the
    path edges have support 0 and peel away in round 1."""
    from data_pipeline_with_spark_spark.operators.graph import ktruss

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4 + [(3, 4), (4, 5)], ["id_a", "id_b"])
    got = {(r.a, r.b): r.support for r in ktruss(df, k=3, rounds=2).collect()}
    assert set(got) == set(k4)
    assert all(s == 2 for s in got.values())


def test_ktruss_k3_shortcut_matches_unrolled_loop(spark):
    """r16: for t = k-2 <= 1 ktruss returns after ONE support pass (an
    edge peeled at t<=1 has support 0, sits in no triangle, and its
    removal changes no other edge's support — rounds 2..n are no-ops).
    Pin the identity against the explicit unrolled loop (the pre-r16
    implementation) on a graph that mixes cliques, chains and a bridge,
    comparing the full (a, b, support) rows including supports."""
    from data_pipeline_with_spark_spark.operators.graph import (
        canonical_edges,
        edge_support,
        ktruss,
    )
    from pyspark.sql import functions as F

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tri = [(10, 11), (11, 12), (10, 12)]
    chain = [(3, 20), (20, 21), (21, 22)]
    bridge = [(12, 0)]
    df = spark.createDataFrame(k4 + tri + chain + bridge, ["id_a", "id_b"])
    got = {(r.a, r.b, r.support) for r in ktruss(df, k=3, rounds=2).collect()}
    # the unrolled pre-r16 loop, verbatim
    e = canonical_edges(df, "id_a", "id_b").localCheckpoint(eager=True)
    for _ in range(2):
        e = (
            edge_support(e)
            .where(F.col("support") >= 1)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    want = {(r.a, r.b, r.support) for r in edge_support(e).collect()}
    assert got == want
    assert {(a, b) for a, b, _ in got} == set(k4) | set(tri)


def test_ktruss_cascade_requires_second_round(spark):
    """k=4 (support >= 2) with a cascade: two triangles sharing an edge
    give the shared edge support 2 but the outer edges support 1 —
    round 1 peels the outer edges, round 2 then peels the shared edge
    (its triangles are gone). Pins that peeling actually iterates."""
    from data_pipeline_with_spark_spark.operators.graph import ktruss

    bowtie = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]  # shared edge (1,2)
    df = spark.createDataFrame(bowtie, ["id_a", "id_b"])
    assert ktruss(df, k=4, rounds=2).count() == 0
    # after only ONE round the shared edge (support was 2) still stands
    one = {(r.a, r.b) for r in ktruss(df, k=4, rounds=1).collect()}
    assert one == {(1, 2)}


def test_kcore_peels_chain_keeps_triangle(spark):
    """2-core on a triangle + a pendant 3-edge chain + an isolated edge:
    the chain peels one endpoint per round (needs all 3 rounds — pins
    the cascade), the isolated edge dies in round 1, the triangle
    survives with core_degree == degree == 2 except the attachment
    node, whose full degree counts the peeled chain edge."""
    from data_pipeline_with_spark_spark.operators.graph import kcore

    tri = [(0, 1), (0, 2), (1, 2)]
    chain = [(2, 3), (3, 4), (4, 5)]
    edges = tri + chain + [(6, 7)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: (r.degree, r.core_degree) for r in
           kcore(df, k=2, rounds=3).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0] == (2, 2) and got[1] == (2, 2)
    assert got[2] == (3, 2)  # full degree saw the chain edge
    # fewer rounds leave the cascade unfinished: after 2 rounds node 3
    # has just lost its last chain neighbour but is still in the edge set
    partial = {r.node for r in kcore(df, k=2, rounds=2).collect()}
    assert partial == {0, 1, 2, 3}


def test_kcore_k3_drops_triangle_keeps_k4(spark):
    """k=3: a triangle (all degrees 2) peels entirely; K4 (all degrees
    3) survives intact — separates cliques by density, not just
    cyclicity."""
    from data_pipeline_with_spark_spark.operators.graph import kcore

    tri = [(10, 11), (10, 12), (11, 12)]
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(tri + k4, ["id_a", "id_b"])
    got = {r.node: (r.degree, r.core_degree) for r in
           kcore(df, k=3, rounds=2).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert all(v == (3, 3) for v in got.values())


@pytest.mark.slow
def test_peeling_deep_rounds_flat_per_round_cost(spark):
    """Peeling-family lineage stress (the PageRank depth doctrine
    applied to ktruss/kcore): on a 10×-fixture-scale synthetic graph,
    tripling the peeling rounds must not blow up per-round cost — the
    per-round eager localCheckpoint keeps the multi-branch support/
    degree subtree from compounding. Loose bound (3× work ⇒ <9× time)
    for the same box-noise reason as the PageRank stress."""
    import time

    from data_pipeline_with_spark_spark.operators.graph import kcore, ktruss

    pairs = [
        (i, (i * 48271 + j * 16807) % 5000)
        for i in range(5000)
        for j in range(1, 4)
        if i != (i * 48271 + j * 16807) % 5000
    ]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"]).cache()
    df.count()

    t0 = time.time()
    assert ktruss(df, k=3, rounds=2).count() >= 0
    base_t = time.time() - t0
    t0 = time.time()
    assert ktruss(df, k=3, rounds=6).count() >= 0
    deep_t = time.time() - t0
    assert deep_t < max(9 * base_t, base_t + 30), (base_t, deep_t)

    t0 = time.time()
    assert kcore(df, k=3, rounds=3).count() > 0
    base_c = time.time() - t0
    t0 = time.time()
    assert kcore(df, k=3, rounds=9).count() > 0
    deep_c = time.time() - t0
    assert deep_c < max(9 * base_c, base_c + 30), (base_c, deep_c)
    df.unpersist()
