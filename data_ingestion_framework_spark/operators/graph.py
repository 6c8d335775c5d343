"""Distributed graph analytics over edge DataFrames.

The LLM-corpus counterpart of the reference's relational surface: web
corpora rank domains/documents by link authority (Common-Crawl-style
curation uses PageRank-family scores as a quality prior), and entity
graphs rank nodes for sampling weights. Nothing here uses GraphX/
GraphFrames — the power iteration is plain DataFrame joins + aggs, so
Catalyst/AQE plan every step (broadcast the rank vector when small,
shuffle-hash otherwise).

Exactness discipline: ranks are INTEGER fixed-point (``scale`` units
per 1.0 of rank mass). Every step is integer multiply / integer DIV /
integer SUM — order-independent and bit-identical across engines —
so a DuckDB oracle can unroll the same iterations and hash-match
(float PageRank would drift in the reduction order).

The connected-components sibling lives in ``operators/dedup.py``
(min-label propagation for duplicate clustering).

Scale notes (100 TB): each iteration is one join edges⋈ranks (shuffle
on src — or a broadcast of ranks while the node set is small) + one
groupBy(dst) SUM. The out-degree join is folded into the edge list
ONCE before the loop and localCheckpoint'd, so iterations reuse the
materialized (src, dst, deg) triple instead of re-deriving it; the
rank lineage is cut every ``checkpoint_every`` iterations to keep the
plan shallow. Dangling mass: with no out-edges a node's rank leaks
(the "weak" PageRank variant) — build the edge list symmetric (as the
registered query does) or accept the leak; redistribution would need a
per-iteration global agg barrier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    dedupe: bool = True,
    checkpoint_every: int = 4,
    seeds: DataFrame | None = None,
    weight: str | None = None,
    preserve_scan_partitioning: bool = False,
) -> DataFrame:
    """Integer fixed-point PageRank power iteration.

    Returns ``(node, rank_units)`` where ``rank_units`` is the rank in
    ``scale`` units (initial rank = ``scale`` per node, i.e. the
    unnormalized formulation; divide by ``scale`` for the float rank).
    ``damping_num/damping_den`` is the damping factor as an exact
    rational (default 85/100 = the classic 0.85).

    ``seeds`` (a 1-column DataFrame of node ids) switches to the
    PERSONALIZED form — TrustRank (Gyöngyi et al. 2004): teleport mass
    lands only on seed nodes (initial rank ``scale`` on seeds, 0
    elsewhere), so rank measures proximity to the trusted set — the
    web-corpus trust-propagation quality prior.

    ``weight`` names an INTEGER edge-weight column: a node's rank
    splits across out-edges proportionally (``units * w DIV w_total``
    instead of ``units DIV out_deg`` — same integer-exact discipline;
    keep ``max_weight * scale * n_nodes`` far below 2^63).

    Pick ``scale`` such that ``n_nodes * scale * damping_num`` stays
    under 2^63 (default 1e9 units is safe to ~10^8 nodes).

    ``preserve_scan_partitioning=True`` is the BUCKETED fast path (the
    100× shape): pass ``edges`` straight from a table bucketed by the
    src column (``df.write.bucketBy(n, src).saveAsTable(...)`` →
    ``spark.table(...)``) and the degree agg, the degree join, and
    every iteration's contributions join are all EXCHANGE-FREE on the
    edge side — the only shuffle left per iteration is the
    groupBy(dst) inflow agg, and only the (small) rank vector ever
    moves. The flag skips the edge-list localCheckpoint (a checkpoint
    erases the scan's HashPartitioning from the planner) and trades it
    for one extra bucketed re-scan per iteration; leave it False for
    non-bucketed inputs, where materializing once beats re-evaluating
    the input plan. ``dedupe``/``seeds`` compose either way.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    if weight:
        cols.append(F.col(weight).cast("bigint").alias("w"))
    e = edges.select(*cols)
    if dedupe:
        e = e.distinct()
    # materialize the degree-annotated edge list ONCE; the node set
    # derives from the checkpointed edges (not the raw input), so the
    # input plan is evaluated exactly once and every iteration joins
    # against materialized data (bucketed fast path: keep the lineage
    # instead, so the scan's partitioning keeps informing the planner)
    if weight:
        deg = e.groupBy("src").agg(F.sum("w").alias("out_deg"))
    else:
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e_deg = e.join(deg, "src")
    if not preserve_scan_partitioning:
        # lazy (r16 opt, guide §5): the nodes checkpoint's eager job
        # below scans e_deg (twice, via the union), materializing this
        # checkpoint in the same job — the eager form paid a separate
        # materialization job per pagerank call
        e_deg = e_deg.localCheckpoint(eager=False)
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
    )
    tele = ((damping_den - damping_num) * scale) // damping_den
    if seeds is not None:
        seed_set = seeds.select(
            F.col(seeds.columns[0]).alias("node"),
            F.lit(True).alias("__seed"),
        ).distinct()
        nodes = nodes.join(seed_set, "node", "left").select(
            "node",
            F.when(F.col("__seed"), F.lit(tele))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("__tele"),
            F.when(F.col("__seed"), F.lit(scale))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("__init"),
        )
    else:
        nodes = nodes.select(
            "node",
            F.lit(tele).cast("bigint").alias("__tele"),
            F.lit(scale).cast("bigint").alias("__init"),
        )
    nodes = nodes.localCheckpoint()
    ranks = nodes.select("node", F.col("__init").alias("units"))
    for i in range(iterations):
        contrib = (
            F.expr("units * w div out_deg")
            if weight
            else F.expr("units div out_deg")
        )
        inflow = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .select(F.col("dst"), contrib.alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            "node",
            (
                F.col("__tele")
                + F.expr(
                    f"{damping_num} * coalesce(inflow, 0L) div {damping_den}"
                )
            ).alias("units"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # lazy: the next iteration's inflow agg scans ranks fully
            # and materializes the cut in the same job (r16 opt)
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("units").alias("rank_units"))


def project_bipartite(
    df: DataFrame,
    key_col: str,
    val_col: str,
    max_per_key: int | None = None,
) -> DataFrame:
    """Bipartite co-occurrence projection: undirected edges ``(u, v)``
    (``u < v``, distinct) linking values that share a key — the
    supplier-co-purchase / co-author / co-click edge builder.

    The self-join fans out Σ|key|² — one hub key (a customer touching
    every supplier) makes a single join key quadratic. ``max_per_key``
    applies the package's observable-cap contract (same as the dedup
    blocks): keys with MORE than ``max_per_key`` values are dropped
    WHOLE before the self-join (never silently truncated), bounding the
    worst case at O(cap²) per key; report the dropped hubs via
    :func:`oversize_keys` — a silent cap would read as full coverage
    when it isn't."""
    base = df.select(F.col(key_col).alias("__k"), F.col(val_col).alias("__v")).distinct()
    if max_per_key is not None:
        from data_ingestion_framework_spark.operators.dedup import (
            _drop_oversize,
        )

        base = _drop_oversize(base, ["__k"], max_per_key)
    return (
        base.alias("a")
        .join(
            base.alias("b"),
            (F.col("a.__k") == F.col("b.__k"))
            & (F.col("a.__v") < F.col("b.__v")),
        )
        .select(F.col("a.__v").alias("u"), F.col("b.__v").alias("v"))
        .distinct()
    )


def oversize_keys(
    df: DataFrame, key_col: str, val_col: str, cap: int
) -> DataFrame:
    """(key, n_vals) for keys over ``max_per_key`` — the dropped-work
    report that keeps :func:`project_bipartite`'s cap honest."""
    return (
        df.select(F.col(key_col).alias("key"), F.col(val_col).alias("__v"))
        .distinct()
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_vals"))
        .where(F.col("n_vals") > cap)
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dedupe: bool = True,
) -> DataFrame:
    """Exact triangle count via DEGREE ORIENTATION (the MapReduce
    triangle-counting discipline of Suri & Vassilvitskii, WWW 2011):
    orient every undirected edge from its lower-``(degree, id)``
    endpoint, then enumerate wedges only from each node's
    OUT-neighborhood and close them with one more join. Under this
    orientation a node's out-degree is bounded by O(√m) regardless of
    its raw degree (work bounded by arboricity), so a hub node no
    longer creates a quadratic wedge key — id-ordered enumeration
    (``a < b < c``) has no such bound: the smallest-id hub owns every
    wedge. The count is identical; only the join fan-out changes.

    Input is treated as UNDIRECTED: each edge is canonicalized to
    ``(min, max)`` and de-duplicated (self-loops dropped). Returns a
    1-row ``(n_triangles bigint)`` frame.

    Scale shape: one degree agg, one degree-annotation join, one wedge
    self-join on the oriented source (bounded fan-out), one closing
    equi-join, one global count — every join a hash join on integer
    keys, all integer arithmetic."""
    return _enumerate_triangles(edges, src, dst, dedupe).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def _canonical_undirected(edges: DataFrame, src: str, dst: str, dedupe: bool):
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
    )
    return e.distinct() if dedupe else e


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _enumerate_triangles(
    edges: DataFrame, src: str, dst: str, dedupe: bool
) -> DataFrame:
    """One row ``(a, b, c)`` per triangle, enumerated under the degree
    orientation (each triangle from its lowest-(deg, id) vertex —
    exactly once, hub-safe)."""
    e = _canonical_undirected(edges, src, dst, dedupe)
    deg = _degrees(e)
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("__du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("__dv"))
    a_first = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v"))
    )
    # oriented edge src→dst with dst's (deg, id) carried for the wedge
    # ordering — the SAME total order that oriented the edges, so the
    # closing edge of an ordered wedge is guaranteed oriented v→w
    d = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(a_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(a_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(a_first, F.col("__dv")).otherwise(F.col("__du")).alias(
                "ddeg"
            ),
        )
        .localCheckpoint()
    )
    x, y, z = d.alias("x"), d.alias("y"), d.alias("z")
    wedge_ordered = (F.col("x.ddeg") < F.col("y.ddeg")) | (
        (F.col("x.ddeg") == F.col("y.ddeg"))
        & (F.col("x.dst") < F.col("y.dst"))
    )
    return (
        x.join(y, (F.col("x.src") == F.col("y.src")) & wedge_ordered)
        .join(
            z,
            (F.col("z.src") == F.col("x.dst"))
            & (F.col("z.dst") == F.col("y.dst")),
        )
        .select(
            F.col("x.src").alias("a"),
            F.col("x.dst").alias("b"),
            F.col("y.dst").alias("c"),
        )
    )


def clustering_coefficients(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    dedupe: bool = True,
    round_to: int = 4,
) -> DataFrame:
    """Per-node triangle counts and LOCAL CLUSTERING COEFFICIENT
    (Watts-Strogatz): ``2·tri(v) / (deg(v)·(deg(v)-1))`` — the
    fraction of a node's neighbor pairs that are themselves linked,
    the standard community-density / spam-farm diagnostic. Nodes with
    degree < 2 score 0 by convention.

    Rides the same degree-oriented triangle enumeration as
    :func:`triangle_count` (hub-safe), plus one explode of each
    triangle to its three corners and a groupBy(node). Counts are
    integer-exact; the coefficient is one correctly-rounded division.
    Returns ``(node, deg, n_triangles, clustering_coeff)`` for every
    node in the edge set."""
    e = _canonical_undirected(edges, src, dst, dedupe).localCheckpoint()
    tri = _enumerate_triangles(e, "u", "v", False)
    corners = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        _degrees(e)
        .join(corners, "node", "left")
        .select(
            "node",
            F.col("deg").cast("bigint").alias("deg"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0)).cast("double")
                    / (F.col("deg") * (F.col("deg") - 1)),
                    round_to,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def oriented_out_degrees(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, out_deg) under :func:`triangle_count`'s degree
    orientation — the observability hook for the bounded-fan-out claim
    (a hub's oriented out-degree stays O(√m) while its raw degree is
    O(n); assert it in tests, monitor it at scale)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("__du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("__dv"))
    a_first = (F.col("__du") < F.col("__dv")) | (
        (F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v"))
    )
    return (
        e.join(du, "u")
        .join(dv, "v")
        .select(F.when(a_first, F.col("u")).otherwise(F.col("v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("out_deg"))
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    dedupe: bool = True,
    preserve_scan_partitioning: bool = False,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007), determinized: every node starts labeled with its own id;
    each round a node adopts the label MOST FREQUENT among its
    neighbors, ties broken by the SMALLEST label, isolated-side nodes
    keep their current label. Fixed ``iterations`` (no convergence
    check — synchronous LPA on bipartite graphs can oscillate, and a
    fixed horizon keeps the result exactly reproducible).

    Pass edges in BOTH directions for an undirected graph (votes flow
    src→dst). Returns ``(node, label)``.

    Scale shape per round: one edges⋈labels equi-join (shuffle on src,
    or a runtime broadcast of the label vector), one (dst, label)
    count, one per-dst argmax window. The min-label connected-
    components sibling lives in ``operators/dedup.py``.

    ``preserve_scan_partitioning=True``: same bucketed fast path as
    :func:`pagerank` — skip the edge checkpoint so a src-bucketed
    table scan keeps its HashPartitioning and each round's votes join
    is exchange-free on the edge side.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if dedupe:
        e = e.distinct()
    if not preserve_scan_partitioning:
        e = e.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.withColumn("label", F.col("node"))
    w = W.partitionBy("dst").orderBy(F.desc("cnt"), F.asc("label"))
    for i in range(iterations):
        votes = (
            e.join(labels, e["src"] == labels["node"])
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winner = (
            votes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col("dst"), F.col("label").alias("__new"))
        )
        labels = (
            labels.join(winner, labels["node"] == winner["dst"], "left")
            .select("node", F.coalesce("__new", "label").alias("label"))
            .localCheckpoint()
        )
    return labels
