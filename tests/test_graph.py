"""Integer fixed-point PageRank (operators/graph.py): exact values on a
hand-checked graph, damping/teleport math, dangling leak semantics."""

import pytest
from pyspark.sql import functions as F

from data_ingestion_framework_spark.operators.graph import pagerank


def _ranks(df):
    return {r["node"]: r["rank_units"] for r in df.collect()}


def _py_pagerank(edges, iterations, scale=10**9, num=85, den=100):
    """Driver-side reference: same integer math, plain dicts."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    tele = ((den - num) * scale) // den
    r = {n: scale for n in nodes}
    for _ in range(iterations):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += r[s] // deg[s]
        r = {n: tele + (num * inflow[n]) // den for n in nodes}
    return r


def test_pagerank_matches_reference_math(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = _ranks(pagerank(df, iterations=4))
    assert got == _py_pagerank(edges, 4)
    # dangling-free cycle conserves teleported mass; 'd' (no inbound)
    # bottoms out at the pure teleport value after one iteration
    assert got["d"] == ((15 * 10**9) // 100)


def test_pagerank_zero_iterations_and_dedupe(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = _ranks(pagerank(df, iterations=0))
    assert got == {"a": 10**9, "b": 10**9}
    # duplicate edges collapse under dedupe=True: symmetric 2-cycle is
    # a fixed point at full mass
    got = _ranks(pagerank(df, iterations=3))
    assert got == _py_pagerank([("a", "b"), ("b", "a")], 3)
    assert got["a"] == got["b"]


def test_pagerank_checkpoint_boundary_preserves_values(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    no_ck = _ranks(pagerank(df, iterations=6, checkpoint_every=0))
    with_ck = _ranks(pagerank(df, iterations=6, checkpoint_every=2))
    assert no_ck == with_ck == _py_pagerank(edges, 6)


def test_label_propagation_two_communities(spark):
    """Two triangles joined by one bridge: each triangle converges to
    its own min label; the deterministic min-label tiebreak decides
    every vote split."""
    from data_ingestion_framework_spark.operators.graph import label_propagation

    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
    bridge = [("c", "x")]
    und = []
    for s, d in tri1 + tri2 + bridge:
        und += [(s, d), (d, s)]
    df = spark.createDataFrame(und, "src string, dst string")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=4).collect()
    }
    # triangle 1 collapses onto 'a'
    assert got["a"] == got["b"] == got["c"] == "a"
    # triangle 2 converges to ONE label of its own — 'c', imported over
    # the bridge in round 1 (x's neighbors {y, z, c} tie; min wins) but
    # never reinforced back, so the communities stay distinct
    assert got["x"] == got["y"] == got["z"] == "c"
    assert got["x"] != got["a"]


def test_label_propagation_isolated_and_tiebreak(spark):
    from data_ingestion_framework_spark.operators.graph import label_propagation

    # star: center 'm' hears labels a, b, c once each → min wins
    df = spark.createDataFrame(
        [("a", "m"), ("b", "m"), ("c", "m")], "src string, dst string"
    )
    got = {r["node"]: r["label"] for r in label_propagation(df, iterations=1).collect()}
    assert got["m"] == "a"
    # pure-source nodes (never a dst) keep their own label
    assert got["a"] == "a" and got["b"] == "b" and got["c"] == "c"


def test_trustrank_seeds_localize_mass(spark):
    """Personalized teleport: rank flows only from seeds; a node
    unreachable from the seed set scores exactly zero, and the Python
    reference math agrees unit-for-unit."""
    from data_ingestion_framework_spark.operators.graph import pagerank

    # two disconnected 2-cycles; seeds in the first only
    und = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(und, "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(df, iterations=3, seeds=seeds).collect()
    }
    assert got["x"] == 0 and got["y"] == 0
    # hand math (scale 1e9, d=85/100): tele_a=15e7, init a=1e9, b=0
    s, tele = 10**9, 150_000_000
    ra, rb = s, 0
    for _ in range(3):
        ra, rb = tele + (85 * rb) // 100, 0 + (85 * ra) // 100
    assert got["a"] == ra and got["b"] == rb


def test_weighted_pagerank_splits_rank_proportionally(spark):
    """Edge weights: a's rank splits 3:1 between b and c; integer math
    agrees with the hand fold, and weight=1 equals the unweighted form."""
    from data_ingestion_framework_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        "src string, dst string, w int",
    )
    got = {
        r["node"]: r["rank_units"]
        for r in pagerank(edges, iterations=2, weight="w").collect()
    }
    s, tele = 10**9, 150_000_000
    r = {"a": s, "b": s, "c": s}
    for _ in range(2):
        inflow = {
            "b": r["a"] * 3 // 4,
            "c": r["a"] * 1 // 4,
            "a": r["b"] + r["c"],
        }
        r = {n: tele + 85 * inflow[n] // 100 for n in r}
    assert got == r
    unit = {
        x["node"]: x["rank_units"]
        for x in pagerank(
            edges.withColumn("w", F.lit(1)), iterations=2, weight="w"
        ).collect()
    }
    plain = {
        x["node"]: x["rank_units"]
        for x in pagerank(edges.drop("w"), iterations=2).collect()
    }
    assert unit == plain


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; a star has 0; direction/duplication of the
    input edges must not matter (canonicalized undirected)."""
    from data_ingestion_framework_spark.operators.graph import triangle_count

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b],
        "src long, dst long",
    )
    assert triangle_count(k4).first()["n_triangles"] == 4
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src long, dst long"
    )
    assert triangle_count(star).first()["n_triangles"] == 0
    # triangle + pendant edge + self-loop noise
    g = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (2, 2), (2, 1)], "src long, dst long"
    )
    assert triangle_count(g).first()["n_triangles"] == 1


def test_triangle_count_matches_id_ordered_enumeration(spark):
    """Degree orientation changes the JOIN SHAPE, never the count:
    compare against the classic a<b<c enumeration on a pseudo-random
    graph (deterministic hash-picked edges)."""
    from data_ingestion_framework_spark.operators.graph import triangle_count

    n = 40
    edges = spark.createDataFrame(
        [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if (a * 1315423911 + b * 2654435761) % 5 == 0
        ],
        "src long, dst long",
    ).localCheckpoint()
    got = triangle_count(edges).first()["n_triangles"]
    e = edges.select("src", "dst")
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    want = (
        ab.join(bc, F.col("ab.dst") == F.col("bc.src"))
        .join(
            ac,
            (F.col("ac.src") == F.col("ab.src"))
            & (F.col("ac.dst") == F.col("bc.dst")),
        )
        .count()
    )
    assert got == want and got > 0


def test_triangle_degree_orientation_bounds_hub_fanout(spark):
    """One hub touching every node: its RAW degree is n-1, but under
    degree orientation every hub edge points INTO the hub (leaves have
    lower degree), so the hub's oriented out-degree — the wedge-join
    fan-out key — is ~0 and the peak fan-out is bounded by the dense
    core, not the hub. This is the skew guarantee id-ordering lacks
    (an id-0 hub would own every wedge)."""
    from data_ingestion_framework_spark.operators.graph import (
        oriented_out_degrees,
        triangle_count,
    )

    hub = 0
    leaves = [(hub, i) for i in range(1, 200)]
    core = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    g = spark.createDataFrame(leaves + core, "src long, dst long")
    out = {r["node"]: r["out_deg"] for r in oriented_out_degrees(g).collect()}
    assert out.get(hub, 0) <= 5  # raw degree 199, oriented out-degree ~0
    assert max(out.values()) <= 5  # bounded by the 5-node core, not the hub
    # K5 core = C(5,3) = 10, plus hub∘core-edge triangles = C(5,2) = 10
    # (all enumerated from low-degree core nodes, never from the hub)
    assert triangle_count(g).first()["n_triangles"] == 20


def test_project_bipartite_cap_and_report(spark):
    """max_per_key drops WHOLE hub keys before the self-join (the
    observable-cap contract) and oversize_keys reports exactly those
    keys; uncapped projection keeps them."""
    from data_ingestion_framework_spark.operators.graph import (
        oversize_keys,
        project_bipartite,
    )

    rows = [(1, s) for s in range(10)] + [(2, 100), (2, 101), (3, 100)]
    df = spark.createDataFrame(rows, "c long, s long")
    full = project_bipartite(df, "c", "s")
    assert full.count() == 45 + 1  # C(10,2) from the hub + (100,101)
    capped = project_bipartite(df, "c", "s", max_per_key=5)
    assert [
        (r["u"], r["v"]) for r in capped.collect()
    ] == [(100, 101)]
    rep = oversize_keys(df, "c", "s", 5).collect()
    assert [(r["key"], r["n_vals"]) for r in rep] == [(1, 10)]


def test_pagerank_bucketed_edges_no_src_exchange(spark, tmp_path):
    """The bucketed fast path: edges from a src-bucketed table with
    preserve_scan_partitioning=True plan ZERO src-side exchanges — the
    degree agg, degree join, and contributions join all ride the
    scan's HashPartitioning; only the groupBy(dst) inflow agg
    shuffles. A non-bucketed input plans src exchanges. Values are
    identical either way."""
    import re

    from data_ingestion_framework_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 23, (i * 7 + 1) % 23) for i in range(300)], "src long, dst long"
    ).distinct()
    spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed_test")
    edges.write.bucketBy(4, "src").mode("overwrite").saveAsTable(
        "pr_edges_bucketed_test"
    )
    try:
        bucketed = spark.table("pr_edges_bucketed_test")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            fast = pagerank(
                bucketed, iterations=1, dedupe=False,
                preserve_scan_partitioning=True,
            )
            plan = fast._jdf.queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            assert not re.search(r"Exchange hashpartitioning\(src", plan)
            slow = pagerank(edges, iterations=1, dedupe=False)
            plan2 = slow._jdf.queryExecution().executedPlan().toString()
            assert re.search(r"Exchange hashpartitioning\(src", plan2)
            got = {r["node"]: r["rank_units"] for r in fast.collect()}
            want = {r["node"]: r["rank_units"] for r in slow.collect()}
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS pr_edges_bucketed_test")


def test_clustering_coefficients_known_graph(spark):
    """Hand-checkable: K4 nodes all have coefficient 1.0; a path's
    middle node 0.0; a triangle with one pendant — the pendant scores
    0 (deg 1), its attachment scores 1/3 of its 3 neighbor pairs."""
    from data_ingestion_framework_spark.operators.graph import (
        clustering_coefficients,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src long, dst long",
    )
    got = {r["node"]: r for r in clustering_coefficients(k4).collect()}
    assert all(r["clustering_coeff"] == 1.0 and r["n_triangles"] == 3
               for r in got.values())
    # triangle 1-2-3 with pendant 4 on node 3
    g = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    got = {r["node"]: r for r in clustering_coefficients(g).collect()}
    assert got[1]["clustering_coeff"] == 1.0
    assert got[2]["clustering_coeff"] == 1.0
    assert got[3]["n_triangles"] == 1 and got[3]["deg"] == 3
    assert got[3]["clustering_coeff"] == round(2 * 1 / (3 * 2), 4)
    assert got[4]["clustering_coeff"] == 0.0 and got[4]["n_triangles"] == 0
