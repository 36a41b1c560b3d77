"""Graph-shaped operators over edge tables.

The reference's graph is the person↔area edge table
(/root/reference/scripts/database/models.py:8-13, built by
zip_code_overlap.py). The relational engine answers traversal queries with
self-joins over the edge list — here the canonical 2-hop pattern, plus
degree statistics. At 100 TB the edge table is bucketed by the join
endpoint so hops are co-located joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..functions.exact import scaled_long
from ..tables import load
from .dedup import sql_stable_round4


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer—supplier edges derived from purchases (distinct pairs) —
    the person_area analogue on the fixture schema."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )


@register(
    "graph_degree",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT supp, count(*) AS degree
    FROM edges GROUP BY supp
    """,
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-degree profile (how many customers touch each supplier) — the
    skew diagnostic you run before traversals."""
    return _edges(spark, sf_dir).groupBy("supp").agg(
        F.count(F.lit(1)).alias("degree")
    )


PAIR_MIN_QTY = 45     # "high-volume" purchase edge gate
PAIR_MIN_SHARED = 3   # shared hv-suppliers for a similarity edge


@register(
    "graph_two_hop",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity >= {PAIR_MIN_QTY})
    SELECT a.cust AS cust1, b.cust AS cust2,
           count(*) AS n_shared_suppliers
    FROM edges a JOIN edges b ON a.supp = b.supp AND a.cust < b.cust
    GROUP BY a.cust, b.cust
    HAVING count(*) >= {PAIR_MIN_SHARED}
    """,
)
def graph_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hop traversal: customer pairs connected through ≥{PAIR_MIN_SHARED}
    shared HIGH-VOLUME suppliers (co-purchase similarity). One self-join
    on the hop node + hash aggregate — the same explode-join shape as the
    n-gram jaccard verify, because 2-hop counting IS set intersection by
    another name. The quantity gate is the density lever: wedge-join cost
    is Σ_supp degree², and on the raw bipartite graph (every supplier
    touching ~half the customers) the 10× probe measured 71s for what the
    gated graph does in ~2s — dense hop nodes MUST be thinned (gate,
    degree-cap, or LSH) before any all-pairs projection, at every scale."""
    return _copurchase_pairs(spark, sf_dir)


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cust1 < cust2, n_shared_suppliers ≥ {PAIR_MIN_SHARED}) over
    high-volume purchase edges — the projected unipartite similarity
    graph over the (thinned) bipartite purchase edges."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= PAIR_MIN_QTY
    )
    e = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.supp") == F.col("b.supp"))
            & (F.col("a.cust") < F.col("b.cust")),
        )
        .groupBy(
            F.col("a.cust").alias("cust1"), F.col("b.cust").alias("cust2")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_suppliers"))
        .filter(F.col("n_shared_suppliers") >= PAIR_MIN_SHARED)
    )


SQL_PAIRS = f"""
    edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity >= {PAIR_MIN_QTY}),
    p AS (
        SELECT a.cust AS c1, b.cust AS c2
        FROM edges a JOIN edges b
          ON a.supp = b.supp AND a.cust < b.cust
        GROUP BY 1, 2 HAVING count(*) >= {PAIR_MIN_SHARED})
"""


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {SQL_PAIRS},
    tri AS (
        SELECT e1.c1 AS a, e1.c2 AS b, e2.c2 AS c
        FROM p e1
        JOIN p e2 ON e1.c2 = e2.c1
        JOIN p e3 ON e3.c1 = e1.c1 AND e3.c2 = e2.c2),
    nodes AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the co-purchase similarity
    graph — the clustering-cohesion metric community detection starts
    from. Standard distributed shape (the MapReduce 'node-iterator'
    algorithm): edges are oriented low→high ONCE (cust1 < cust2 from the
    pair builder), so each triangle {a<b<c} is found exactly once by
    joining (a,b)⋈(b,c) and probing (a,c) — two equi-joins, no direction
    dedup, no cartesian. At 100 TB orient edges by (degree, id) instead of
    raw id so high-degree hubs anchor few wedges (the classic skew fix);
    the pair graph is persisted because all three join legs read it."""
    p = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2").persist()
    return triangles_per_node(p)


def triangles_per_node(p: DataFrame) -> DataFrame:
    """Per-node triangle counts from an ORIENTED edge list (cust1 < cust2,
    each undirected edge exactly once). Two equi-joins: wedge (a,b)+(b,c)
    closed by probing (a,c)."""
    e1 = p.select(F.col("cust1").alias("a"), F.col("cust2").alias("b"))
    e2 = p.select(F.col("cust1").alias("b"), F.col("cust2").alias("c"))
    e3 = p.select(F.col("cust1").alias("a"), F.col("cust2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


@register(
    "agg_reaggregate",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS DOUBLE)
               AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def agg_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compositional aggregation: the daily rollup computed FROM the hourly
    rollup (counts summed, scaled-int partial sums merged) must equal the
    daily computed from raw — the algebraic property incremental
    materialized views depend on. The oracle computes daily directly; the
    engine goes raw → hourly → daily."""
    e = load(spark, sf_dir, "events")
    scaled = scaled_long(F.col("value"), 100)
    hourly = (
        e.groupBy(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(scaled).alias("sum_scaled"),
        )
    )
    return (
        hourly.groupBy(
            (F.floor(F.col("hour_start") / 86400) * 86400)
            .cast("long")
            .alias("day_start"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("sum_scaled") / 100.0).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank in exact integer fixed-point arithmetic
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000  # ranks carried as millionths
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as a rational


def _pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (doubled) customer↔supplier edges with string node ids —
    doubling gives every node outdegree ≥ 1, so there is no dangling-mass
    term to redistribute."""
    e = _edges(spark, sf_dir)
    fwd = e.select(
        F.concat(F.lit("c"), F.col("cust").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("supp").cast("string")).alias("dst"),
    )
    return fwd.unionAll(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(spark: SparkSession, sf_dir: str, iterations: int = 2) -> DataFrame:
    """PageRank with ALL arithmetic in scaled integers: contributions are
    ``rank div outdegree`` (integer division), the damped update is
    ``150000 + (85 * Σcontrib) div 100``. Floating-point PageRank is
    order-dependent under parallel summation; the integer fixed-point form
    is bit-identical at any partitioning — which is what makes an
    ITERATIVE algorithm oracle-checkable (the SQL twin unrolls the same
    iterations as CTEs). Each iteration is one join + one aggregation,
    shuffling on the destination node — the natural bucketing key.

    Lineage hygiene for N iterations, measured rather than assumed:
    ``ed`` (edges⋈deg — the output of the expensive 10⁷-row fact join +
    distinct, but itself SMALL) is persisted once, so no iteration
    re-derives the edge build; the iterations themselves stay LAZY and
    fuse into the final action — an eager per-iteration localCheckpoint
    was tried first and made the 10× probe 4-7× SLOWER (splitting the
    plan into per-iteration jobs breaks subtree reuse and re-runs the
    base build). Lineage is truncated every CHECKPOINT_EVERY iterations
    instead: plan depth is bounded by a constant, recompute-on-failure
    re-runs at most 4 cheap cached-input iterations, and the common
    N≤5 case runs as one fully pipelined job."""
    CHECKPOINT_EVERY = 5
    edges = _pr_edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    ranks = deg.select(F.col("src").alias("node"), F.lit(PR_SCALE).alias("r"))
    ed = edges.join(deg, "src")
    for i in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("r div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (
                F.lit(PR_SCALE * 15 // 100)
                + F.expr(f"({PR_DAMP_NUM} * contrib) div {PR_DAMP_DEN}")
            ).alias("r"),
        )
        if (i + 1) % CHECKPOINT_EVERY == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").cast("long").alias("rank_scaled"))


@register(
    "graph_pagerank",
    oracle=f"""
    WITH e0 AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (
        SELECT 'c' || CAST(cust AS VARCHAR) AS src,
               's' || CAST(supp AS VARCHAR) AS dst FROM e0
        UNION ALL
        SELECT 's' || CAST(supp AS VARCHAR), 'c' || CAST(cust AS VARCHAR)
        FROM e0),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    r0 AS (SELECT src AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
    c1 AS (
        SELECT e.dst AS node, sum(r0.r // d.outdeg) AS contrib
        FROM edges e
        JOIN deg d ON d.src = e.src
        JOIN r0 ON r0.node = e.src
        GROUP BY e.dst),
    r1 AS (SELECT node,
                  {PR_SCALE * 15 // 100} + ({PR_DAMP_NUM} * contrib)
                      // {PR_DAMP_DEN} AS r
           FROM c1),
    c2 AS (
        SELECT e.dst AS node, sum(r1.r // d.outdeg) AS contrib
        FROM edges e
        JOIN deg d ON d.src = e.src
        JOIN r1 ON r1.node = e.src
        GROUP BY e.dst)
    SELECT node,
           CAST({PR_SCALE * 15 // 100} + ({PR_DAMP_NUM} * contrib)
                // {PR_DAMP_DEN} AS BIGINT) AS rank_scaled
    FROM c2
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two PageRank iterations over the purchase graph, integer-exact (see
    pagerank()); the oracle unrolls the identical iterations as CTEs. The
    N-iteration driver loop is the library function, exercised further in
    tests/test_operators.py."""
    return pagerank(spark, sf_dir, iterations=2)


def label_propagation(
    und: DataFrame, rounds: int = 2
) -> DataFrame:
    """Synchronous label propagation over an undirected neighbor relation
    ``und(v, n)``: every round, each node adopts the most frequent label in
    its CLOSED neighborhood (self + neighbors), ties to the smallest label
    — fully deterministic, unlike classic randomized LPA. Returns
    (v, community).

    Iterative-op hygiene (the pagerank lesson, VERDICT r2): the closed
    neighborhood relation is persisted once; each round's label frame is
    localCheckpoint'ed so lineage stays flat and the per-round join reads
    a materialized plan, not a growing tree."""
    from .ckpt import pin

    closed = und.unionAll(
        und.select(F.col("v"), F.col("v").alias("n")).distinct()
    ).persist()
    labels = closed.select("v").distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for _ in range(rounds):
        # pin, not bare localCheckpoint (round-10, VERDICT r9 #5): the
        # round count is FIXED — no convergence probe executes at build —
        # and each round references the previous labels exactly once, so
        # plan growth is linear and a PLAN_ONLY audit can walk the full
        # unrolled tree (graph_label_propagation / graph_modularity leave
        # the unauditable tail entirely).
        labels = pin(lp_round(closed, labels))
    return labels.select("v", F.col("lbl").alias("community"))


def lp_round(closed: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE synchronous LP round, pre-checkpoint: closed-neighborhood
    frequency vote, ties to the smallest label (deterministic). The
    row_number window is PARTITIONED by node — no global funnel."""
    w = W.partitionBy("v").orderBy(F.col("cnt").desc(), F.col("lbl"))
    return (
        closed.join(labels.select(F.col("v").alias("n"), "lbl"), "n")
        .groupBy("v", "lbl")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("v", "lbl")
    )


# Two unrolled label-propagation rounds over the thinned co-purchase
# graph — shared verbatim by graph_label_propagation and
# graph_modularity so both oracles see the SAME communities:
SQL_LP2_LABELS = """
    und AS (SELECT c1 AS v, c2 AS n FROM p
            UNION ALL SELECT c2 AS v, c1 AS n FROM p),
    closed AS (SELECT v, n FROM und
               UNION ALL SELECT DISTINCT v, v FROM und),
    l1 AS (
        SELECT v, lbl FROM (
            SELECT c.v, c.n AS lbl, count(*) AS cnt,
                   row_number() OVER (PARTITION BY c.v
                                      ORDER BY count(*) DESC, c.n) AS rn
            FROM closed c GROUP BY c.v, c.n) WHERE rn = 1),
    r2 AS (SELECT c.v, l1.lbl FROM closed c JOIN l1 ON c.n = l1.v),
    l2 AS (
        SELECT v, lbl FROM (
            SELECT v, lbl, count(*) AS cnt,
                   row_number() OVER (PARTITION BY v
                                      ORDER BY count(*) DESC, lbl) AS rn
            FROM r2 GROUP BY v, lbl) WHERE rn = 1)
"""


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH {SQL_PAIRS},
    {SQL_LP2_LABELS}
    SELECT v AS cust, lbl AS community FROM l2
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by deterministic synchronous label propagation
    over the thinned co-purchase graph — 2 registered rounds (the oracle
    unrolls them as CTEs, same pattern as graph_pagerank); the library
    loop (label_propagation) runs any N with flat lineage.

    Round 1 of closed-neighborhood mode over identity labels reduces to
    min-of-neighborhood; round 2 is a true frequency vote, so label mass
    concentrates into hubs. Scale shape: each round is one equi-join on
    the label key + one (v, lbl) hash aggregate + one top-1 window —
    all key-partitioned shuffles on node id; no driver materialization,
    lineage capped by localCheckpoint."""
    pairs = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2")
    und = pairs.select(
        F.col("cust1").alias("v"), F.col("cust2").alias("n")
    ).unionAll(pairs.select(F.col("cust2").alias("v"), F.col("cust1").alias("n")))
    out = label_propagation(und, rounds=2)
    return out.select(F.col("v").alias("cust"), "community")


@register(
    "graph_clustering_coeff",
    oracle=f"""
    WITH {SQL_PAIRS},
    tri AS (
        SELECT e1.c1 AS a, e1.c2 AS b, e2.c2 AS c
        FROM p e1
        JOIN p e2 ON e1.c2 = e2.c1
        JOIN p e3 ON e3.c1 = e1.c1 AND e3.c2 = e2.c2),
    tnodes AS (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri),
    tcount AS (SELECT node, count(*) AS n_tri FROM tnodes GROUP BY node),
    dnodes AS (
        SELECT c1 AS node FROM p UNION ALL SELECT c2 FROM p),
    deg AS (SELECT node, count(*) AS degree FROM dnodes GROUP BY node)
    SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.degree < 2 THEN 0.0
                ELSE floor(2.0 * coalesce(t.n_tri, 0)
                           / (d.degree * (d.degree - 1)) * 10000.0 + 0.5)
                     / 10000.0 END AS clustering_coeff
    FROM deg d LEFT JOIN tcount t USING (node)
    """,
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node — triangles joined with
    degrees: C(v) = 2·T(v) / (deg(v)·(deg(v)−1)), the standard
    community-cohesion score (Watts–Strogatz 1998). Composes the two
    existing subtrees (oriented wedge-close triangle count + degree
    profile) over ONE persisted pair relation, so the co-purchase edges
    are built once for both. Degree-1 nodes define C = 0. The ratio is
    an exact small-integer quotient, floor-rounded once.

    Scale: everything downstream of the (persisted) pair builder runs on
    |pairs| rows; the triangle joins stay the two equi-joins; the degree
    aggregate is a map-side-combined count."""
    p = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2").persist()
    tri = triangles_per_node(p)
    deg = (
        p.select(F.explode(F.array("cust1", "cust2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    coeff = F.when(F.col("degree") < 2, F.lit(0.0)).otherwise(
        F.floor(
            2.0
            * F.coalesce(F.col("n_triangles"), F.lit(0))
            / (F.col("degree") * (F.col("degree") - 1))
            * 10000.0
            + 0.5
        )
        / 10000.0
    )
    return deg.join(tri, "node", "left").select(
        "node",
        F.col("degree").cast("long").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0))
        .cast("long")
        .alias("n_triangles"),
        coeff.alias("clustering_coeff"),
    )


WALK_STEPS = 3


def _sql_walk_step(i: int) -> str:
    """One deterministic step: from w{i}.cur pick the neighbor whose rank
    equals md5(cur||'#w{i}') % degree (+1, ranks are 1-based)."""
    return f"""
    w{i + 1} AS (
        SELECT w{i}.start, nb.nbr AS cur
        FROM w{i}
        JOIN deg ON deg.node = w{i}.cur
        JOIN nb ON nb.node = w{i}.cur
         AND nb.rk = CAST(('0x' || substr(md5(CAST(w{i}.cur AS VARCHAR)
                                              || '#w{i}'), 1, 8)) AS BIGINT)
                     % deg.degree + 1)"""


@register(
    "graph_random_walks",
    oracle=f"""
    WITH {SQL_PAIRS},
    und AS (
        SELECT c1 AS node, c2 AS nbr FROM p
        UNION ALL SELECT c2, c1 FROM p),
    nb AS (
        SELECT node, nbr,
               row_number() OVER (PARTITION BY node ORDER BY nbr) AS rk
        FROM und),
    deg AS (SELECT node, count(*) AS degree FROM und GROUP BY node),
    w0 AS (SELECT node AS start, node AS cur FROM deg),
    {",".join(_sql_walk_step(i) for i in range(WALK_STEPS))}
    SELECT start, CAST(cur AS BIGINT) AS end_node
    FROM w{WALK_STEPS} ORDER BY start
    """,
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'random' walks (the node2vec/DeepWalk sampling
    primitive made engine-exact): from every node, {WALK_STEPS} steps, the
    step from node v taking the neighbor ranked md5(v,'#w<step>') %
    deg(v) in v's sorted adjacency — a hash-derived uniform choice that
    is reproducible across engines, partitionings and retries (the same
    rand()-ban discipline as the samplers). Each step is one equi-join of
    the walk frontier against the ranked adjacency + degree relations;
    the walk table stays |nodes| rows throughout.

    Scale: adjacency and degree build once (two aggregates over the pair
    relation); steps are frontier⋈adjacency hash joins on the node key —
    the textbook distributed-walk shape, N steps = N joins, no lineage
    blowup at fixed N."""
    # Round-11 (VERDICT r10 #5): persist the PAIR relation, not just the
    # ranked adjacency — un-persisted, the expensive edges-self-join
    # tower executed three times (once under nb's window, once under
    # deg's aggregate — ReuseExchange can't dedup across the differing
    # post-shapes — and a THIRD time for the walk seed, which reads deg
    # outside the persisted adj). One build now feeds all three readers.
    p = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2").persist()
    und = p.select(
        F.col("cust1").alias("node"), F.col("cust2").alias("nbr")
    ).unionByName(
        p.select(F.col("cust2").alias("node"), F.col("cust1").alias("nbr"))
    )
    nb = und.select(
        "node",
        "nbr",
        F.row_number()
        .over(W.partitionBy("node").orderBy("nbr"))
        .alias("rk"),
    )
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    adj = nb.join(deg, "node").persist()

    walk = deg.select(F.col("node").alias("start"), F.col("node").alias("cur"))
    for i in range(WALK_STEPS):
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("cur").cast("string"), F.lit(f"#w{i}")
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % F.col("degree")
            + 1
        )
        walk = (
            walk.join(adj, walk["cur"] == adj["node"])
            .filter(F.col("rk") == pick)
            .select("start", F.col("nbr").alias("cur"))
        )
    return walk.select(
        "start", F.col("cur").cast("long").alias("end_node")
    ).orderBy("start")


_AA_SCALE = 1_000_000_000


@register(
    "graph_adamic_adar",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity >= {PAIR_MIN_QTY}),
    deg AS (SELECT supp, count(*) AS d FROM edges GROUP BY supp),
    w AS (
        SELECT e1.cust AS c1, e2.cust AS c2, deg.d
        FROM edges e1
        JOIN edges e2 ON e1.supp = e2.supp AND e1.cust < e2.cust
        JOIN deg ON e1.supp = deg.supp)
    SELECT c1 AS cust1, c2 AS cust2,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(CAST(floor({_AA_SCALE}.0 / ln(d) + 0.5) AS BIGINT))
                AS BIGINT) AS aa_q,
           floor(sum(CAST(floor({_AA_SCALE}.0 / ln(d) + 0.5) AS BIGINT))
                 / {_AA_SCALE}.0 * 10000.0 + 0.5) / 10000.0 AS adamic_adar
    FROM w GROUP BY c1, c2 HAVING count(*) >= {PAIR_MIN_SHARED}
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction over the high-volume co-purchase graph:
    candidate customer pairs scored by Σ 1/ln(degree(z)) over their common
    suppliers z — rare shared neighbors count more than promiscuous hubs
    (the similarity refinement of graph_two_hop's raw common-neighbor
    count; same {PAIR_MIN_SHARED}-shared gate bounds the output).

    Determinism: each neighbor's 1/ln(d) term is quantized to a
    {_AA_SCALE}-scaled BIGINT BEFORE the per-pair sum (the quantize-then-
    sum discipline — a multi-term double sum is partition-order-dependent,
    integer addition isn't); ranking/display derive from the integer.
    A common neighbor always has d >= 2, so ln(d) is never 0.

    Scale shape: the wedge self-join runs on the quantity-THINNED edge
    list (graph_two_hop's density lesson: wedge cost is Σ_supp deg², so
    dense hop nodes must be gated first), degrees join in on supp — the
    same key the wedge join already shuffles on, so the degree attach is
    co-located, then one hash agg on the pair."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= PAIR_MIN_QTY
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
        )
        .distinct()
        .persist()  # feeds the degree agg AND both wedge sides
    )
    deg = edges.groupBy("supp").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("cust").alias("c1"), "supp")
    e2 = edges.select(F.col("cust").alias("c2"), "supp")
    term = F.floor(_AA_SCALE / F.log(F.col("d")) + 0.5).cast("long")
    w = (
        e1.join(e2, "supp")
        .filter(F.col("c1") < F.col("c2"))
        .join(deg, "supp")
    )
    aa_q = F.sum(term)
    return (
        w.groupBy("c1", "c2")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            aa_q.cast("long").alias("aa_q"),
        )
        .filter(F.col("n_common") >= PAIR_MIN_SHARED)
        .select(
            F.col("c1").alias("cust1"),
            F.col("c2").alias("cust2"),
            "n_common",
            "aa_q",
            (
                F.floor(F.col("aa_q") / _AA_SCALE * 10000.0 + 0.5) / 10000.0
            ).alias("adamic_adar"),
        )
    )


@register(
    "graph_jaccard_neighbors",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_quantity >= {PAIR_MIN_QTY}),
    degc AS (SELECT cust, count(*) AS d FROM edges GROUP BY cust),
    w AS (
        SELECT e1.cust AS c1, e2.cust AS c2, count(*) AS n_common
        FROM edges e1 JOIN edges e2
             ON e1.supp = e2.supp AND e1.cust < e2.cust
        GROUP BY 1, 2 HAVING count(*) >= {PAIR_MIN_SHARED})
    SELECT w.c1 AS cust1, w.c2 AS cust2,
           CAST(w.n_common AS BIGINT) AS n_common,
           CAST(d1.d AS BIGINT) AS deg1, CAST(d2.d AS BIGINT) AS deg2,
           floor(CAST(w.n_common AS DOUBLE)
                 / CAST(d1.d + d2.d - w.n_common AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS jaccard
    FROM w JOIN degc d1 ON d1.cust = w.c1
           JOIN degc d2 ON d2.cust = w.c2
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard neighborhood-overlap link prediction over the high-volume
    co-purchase graph: |N(a) ∩ N(b)| / |N(a) ∪ N(b)| for customer pairs
    sharing >= {PAIR_MIN_SHARED} suppliers — the normalized companion of
    graph_adamic_adar (AA weights rarity of shared neighbors, Jaccard
    normalizes by total neighborhood size, so hub customers with huge
    degree stop dominating the candidate ranking).

    Determinism: the score is one division of exact integers
    (n_common / (d1 + d2 - n_common)), then the 4-decimal floor. Scale
    shape: identical to the AA wedge — quantity-thinned edges, the
    self-join shuffles on supp, then one pair aggregate; customer
    degrees attach by cust key AFTER the pair aggregate, so the join
    input is the (gated) pair list, not the wedge expansion.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= PAIR_MIN_QTY
    )
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
        )
        .distinct()
        .persist()  # degree agg + both wedge sides
    )
    degc = edges.groupBy("cust").agg(F.count(F.lit(1)).alias("d"))
    e1 = edges.select(F.col("cust").alias("c1"), "supp")
    e2 = edges.select(F.col("cust").alias("c2"), "supp")
    w = (
        e1.join(e2, "supp")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= PAIR_MIN_SHARED)
    )
    return (
        w.join(degc.withColumnRenamed("cust", "c1").withColumnRenamed("d", "d1"), "c1")
        .join(degc.withColumnRenamed("cust", "c2").withColumnRenamed("d", "d2"), "c2")
        .select(
            F.col("c1").alias("cust1"),
            F.col("c2").alias("cust2"),
            "n_common",
            F.col("d1").cast("long").alias("deg1"),
            F.col("d2").cast("long").alias("deg2"),
            (
                F.floor(
                    F.col("n_common").cast("double")
                    / (F.col("d1") + F.col("d2") - F.col("n_common")).cast(
                        "double"
                    )
                    * 10000.0
                    + 0.5
                )
                / 10000.0
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities in exact integer fixed-point arithmetic
# ---------------------------------------------------------------------------

HITS_SCALE = 1_000_000  # scores carried as millionth-shares of the L1 mass


@register(
    "graph_hits",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    a1 AS (SELECT supp, CAST(count(*) AS BIGINT) * {HITS_SCALE} AS a
           FROM edges GROUP BY supp),
    at1 AS (SELECT sum(a) AS t FROM a1),
    a1q AS (SELECT supp, (a * {HITS_SCALE}) // t AS aq
            FROM a1 CROSS JOIN at1),
    h1 AS (SELECT e.cust, sum(q.aq) AS h
           FROM edges e JOIN a1q q ON q.supp = e.supp GROUP BY e.cust),
    ht1 AS (SELECT sum(h) AS t FROM h1),
    h1q AS (SELECT cust, (h * {HITS_SCALE}) // t AS hq
            FROM h1 CROSS JOIN ht1),
    a2 AS (SELECT e.supp, sum(q.hq) AS a
           FROM edges e JOIN h1q q ON q.cust = e.cust GROUP BY e.supp),
    at2 AS (SELECT sum(a) AS t FROM a2),
    a2q AS (SELECT supp, (a * {HITS_SCALE}) // t AS aq
            FROM a2 CROSS JOIN at2)
    SELECT 'authority' AS role, supp AS node, CAST(aq AS BIGINT) AS score_q
    FROM a2q
    UNION ALL
    SELECT 'hub' AS role, cust AS node, CAST(hq AS BIGINT) AS score_q
    FROM h1q
    ORDER BY role, node
    """,
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM 1999) over the bipartite
    purchase graph: customers are hubs, suppliers are authorities. One and
    a half power iterations (auth ← hubs, hub ← auths, auth ← hubs), each
    followed by L1 normalization — all in scaled-integer fixed point so an
    ITERATIVE spectral method stays bit-identical under any partitioning
    and the DuckDB twin can unroll the same iterations as CTEs (the
    graph_pagerank discipline; reference analytics are single-pass SQL,
    /root/reference/scripts/database/database.py:1 — this extends the
    graph family along the ranking axis).

    Determinism: every update is an exact integer sum over edges; the L1
    normalization is one truncated integer division per node,
    ``(score * SCALE) div total``, where ``total`` is an exact integer —
    no float enters the pipeline, so no summation-order sensitivity.
    Overflow headroom is arithmetic, not hopeful: after each
    normalization the vector sums to ~SCALE (1e6), so the next raw update
    is bounded by SCALE per node and the ``* SCALE`` renormalation
    numerator by ~1e12 per node (× n_nodes ≤ ~1e7 for the totals at any
    plausible node count) — well inside int64.

    Scale shape: each half-iteration is one equi-join of the edge list
    against the current score vector (shuffle on the joined endpoint —
    the natural bucketing key) plus one hash aggregate; the L1 totals are
    single-row aggregates broadcast back with a crossJoin. Edge list is
    persisted once; nothing driver-side ever exceeds one row per
    normalization constant.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp")
        )
        .distinct()
        .persist()  # three score-update joins over the same edge list
    )
    # Prime the cache with one materializing action BEFORE the L1-total
    # broadcast subtrees plan their own jobs: un-primed, each broadcast
    # stage (at1/ht1/at2) raced to recompute the join+distinct — 3
    # redundant edge builds, measured 5.4s -> ~2s at sf0.1. One count()
    # job IS the single edge build; every later stage reads the cache.
    edges.count()

    def l1_normalize(df: DataFrame, score: str) -> DataFrame:
        # Persist the raw score frame and pull the ONE L1 total as a
        # driver scalar (house-allowed singleton collect): a broadcast-
        # subtree total re-ran the whole upstream iteration chain per
        # consumer (O(k^2) shuffles across the unrolled iterations —
        # measured 5.4s at sf0.1); eager normalization runs each
        # iteration's join+agg exactly once and later stages read the
        # caches.
        df = df.persist()
        total = df.agg(F.sum(score)).first()[0]
        return df.select(
            *[c for c in df.columns if c != score],
            F.expr(f"({score} * {HITS_SCALE}L) div {total}L").alias(score),
        )

    # auth ← hubs (h0 = SCALE for every customer collapses to count*SCALE)
    a1 = edges.groupBy("supp").agg(
        (F.count(F.lit(1)) * F.lit(HITS_SCALE)).cast("long").alias("a")
    )
    a1q = l1_normalize(a1, "a")
    # hub ← auths
    # score vectors are node-sized (≪ edges) — broadcast them into the
    # edge joins so each half-iteration is a map-side join + one hash agg
    # (un-hinted, the 16k-row normalized frames have no size estimate and
    # fell back to sort-merge, shuffling the 600k edges twice per
    # iteration); beyond driver-broadcast size the same plan degrades to
    # the bucketed equi-join on the endpoint key
    h1 = (
        edges.join(F.broadcast(a1q), "supp")
        .groupBy("cust")
        .agg(F.sum("a").alias("h"))
    )
    h1q = l1_normalize(h1, "h")
    # auth ← hubs, second pass
    a2 = (
        edges.join(F.broadcast(h1q), "cust")
        .groupBy("supp")
        .agg(F.sum("h").alias("a"))
    )
    a2q = l1_normalize(a2, "a")
    return (
        a2q.select(
            F.lit("authority").alias("role"),
            F.col("supp").alias("node"),
            F.col("a").cast("long").alias("score_q"),
        )
        .unionAll(
            h1q.select(
                F.lit("hub").alias("role"),
                F.col("cust").alias("node"),
                F.col("h").cast("long").alias("score_q"),
            )
        )
        .orderBy("role", "node")
    )


# ---------------------------------------------------------------------------
# graph_kcore — unrolled k-core peeling over the co-purchase graph
# ---------------------------------------------------------------------------

KCORE_K = 3       # core threshold: keep nodes with >= K surviving neighbors
KCORE_ROUNDS = 3  # unrolled peel rounds (the oracle unrolls the same three)


def kcore_degrees(e: DataFrame) -> DataFrame:
    """Degree profile of the doubled edge relation ``e(n, m)``."""
    return e.groupBy("n").agg(F.count(F.lit(1)).alias("d"))


def kcore_peel_body(e: DataFrame, deg: DataFrame) -> DataFrame:
    """ONE peel round, pre-checkpoint (round-10 audit-hook entry, VERDICT
    r9 #5): drop every edge touching a node whose surviving degree fell
    under KCORE_K. Survivor sets are orders of magnitude smaller than
    edges (broadcast here; at 100 TB they stay equi-joins on the bucketed
    endpoint key)."""
    keep = deg.filter(F.col("d") >= KCORE_K).select("n")
    return (
        e.join(F.broadcast(keep), "n")
        .join(F.broadcast(keep.select(F.col("n").alias("m"))), "m")
        .select("n", "m")
    )


@register(
    "graph_kcore",
    oracle=f"""
    WITH {SQL_PAIRS},
    und AS (SELECT c1 AS n, c2 AS m FROM p UNION ALL SELECT c2, c1 FROM p),
    d0 AS (SELECT n, count(*) AS d FROM und GROUP BY n),
    k1 AS (SELECT n FROM d0 WHERE d >= {KCORE_K}),
    e1 AS (SELECT u.n, u.m FROM und u
           JOIN k1 a ON a.n = u.n JOIN k1 b ON b.n = u.m),
    d1 AS (SELECT n, count(*) AS d FROM e1 GROUP BY n),
    k2 AS (SELECT n FROM d1 WHERE d >= {KCORE_K}),
    e2 AS (SELECT u.n, u.m FROM e1 u
           JOIN k2 a ON a.n = u.n JOIN k2 b ON b.n = u.m),
    d2 AS (SELECT n, count(*) AS d FROM e2 GROUP BY n),
    k3 AS (SELECT n FROM d2 WHERE d >= {KCORE_K}),
    e3 AS (SELECT u.n, u.m FROM e2 u
           JOIN k3 a ON a.n = u.n JOIN k3 b ON b.n = u.m),
    d3 AS (SELECT n, count(*) AS d FROM e3 GROUP BY n)
    SELECT d0.n AS node,
           CAST(d0.d AS BIGINT) AS deg0,
           CAST(COALESCE(d3.d, 0) AS BIGINT) AS deg_r{KCORE_ROUNDS},
           CAST(CASE WHEN d0.d < {KCORE_K} THEN 1
                     WHEN COALESCE(d1.d, 0) < {KCORE_K} THEN 2
                     WHEN COALESCE(d2.d, 0) < {KCORE_K} THEN 3
                     ELSE 0 END AS INTEGER) AS removed_round
    FROM d0
    LEFT JOIN d1 ON d1.n = d0.n
    LEFT JOIN d2 ON d2.n = d0.n
    LEFT JOIN d3 ON d3.n = d0.n
    ORDER BY node
    """,
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (Seidman 1983; the distributed formulation is
    Montresor et al., "Distributed k-Core Decomposition", PODC 2011):
    repeatedly delete nodes with degree < {KCORE_K} from the co-purchase
    similarity graph, {KCORE_ROUNDS} unrolled rounds. The surviving
    subgraph approaches the {KCORE_K}-core — the standard dense-community
    seed and the 'is this account embedded or peripheral?' screen that
    runs before any community detection. Output per original node: its
    starting degree, its degree after round {KCORE_ROUNDS}, and the round
    that removed it (0 = survived all rounds). Deletion CASCADES —
    removing a peripheral node can drag its neighbors below K — which is
    what the round-by-round column makes visible and what a single
    degree threshold (graph_degree) cannot express.

    Determinism: pure integer degree counts and threshold compares; no
    scores, no ties. A fixed unroll depth (not run-to-convergence) keeps
    the Spark plan static and lets the DuckDB twin unroll the identical
    three rounds as CTEs — same discipline as graph_pagerank's fixed
    two iterations.

    Scale shape: each round is one hash aggregate (degree) plus two
    semi-shaped equi-joins of the edge list against the (node-sized)
    survivor set — never an all-pairs product. Edges are shuffled on the
    endpoint key, the natural bucketing; survivor sets are orders of
    magnitude smaller than edges (broadcast here; at 100 TB they stay
    equi-joins on the bucketed key). The peeled edge list shrinks
    monotonically, so later rounds cost less, and the unionAll'd
    direction doubling is a projection, not a shuffle.
    """
    p = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2")
    und = (
        p.select(F.col("cust1").alias("n"), F.col("cust2").alias("m"))
        .unionAll(p.select(F.col("cust2").alias("n"), F.col("cust1").alias("m")))
        .persist()  # four degree passes + three peels read it
    )

    def degrees(e: DataFrame) -> DataFrame:
        return kcore_degrees(e)

    def peel(e: DataFrame, deg: DataFrame) -> DataFrame:
        # iterative-op hygiene (the label_propagation lesson): flatten
        # lineage each round, or the degree/peel subtrees re-expand
        # combinatorially — each peel references the edge frame three
        # times (probe + both keep sides), so an un-checkpointed 3-round
        # unroll is ~27 copies of the co-purchase subtree (the plan
        # printed 15k lines and re-ran earlier rounds inside later
        # rounds' DAGs). That fan-out also rules out the pin() route the
        # linear-growth loops take — the round body is audited instead
        # through operators/audit_hooks.py on LocalRelation stand-ins.
        return kcore_peel_body(e, deg).localCheckpoint(eager=True)

    d0 = degrees(und)
    e1 = peel(und, d0)
    d1 = degrees(e1)
    e2 = peel(e1, d1)
    d2 = degrees(e2)
    e3 = peel(e2, d2)
    d3 = degrees(e3)

    def side(deg: DataFrame, name: str) -> DataFrame:
        return deg.select("n", F.col("d").alias(name))

    out = (
        side(d0, "deg0")
        .join(side(d1, "d1"), "n", "left")
        .join(side(d2, "d2"), "n", "left")
        .join(side(d3, "d3"), "n", "left")
    )
    return out.select(
        F.col("n").alias("node"),
        F.col("deg0").cast("long"),
        F.coalesce("d3", F.lit(0)).cast("long").alias(f"deg_r{KCORE_ROUNDS}"),
        F.when(F.col("deg0") < KCORE_K, 1)
        .when(F.coalesce("d1", F.lit(0)) < KCORE_K, 2)
        .when(F.coalesce("d2", F.lit(0)) < KCORE_K, 3)
        .otherwise(0)
        .cast("int")
        .alias("removed_round"),
    ).orderBy("node")


# --------------------------------------------------------------------------
# graph_bfs_distance — unrolled breadth-first distance histogram
# --------------------------------------------------------------------------

BFS_ROUNDS = 3


@register(
    "graph_bfs_distance",
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (
        SELECT 'c' || CAST(cust AS VARCHAR) AS src,
               's' || CAST(supp AS VARCHAR) AS dst FROM e0
        UNION ALL
        SELECT 's' || CAST(supp AS VARCHAR), 'c' || CAST(cust AS VARCHAR)
        FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    d0 AS (SELECT min(node) AS node FROM nodes),
    f1 AS (
        SELECT DISTINCT e.dst AS node FROM edges e
        JOIN d0 ON d0.node = e.src
        EXCEPT SELECT node FROM d0),
    f2 AS (
        SELECT DISTINCT e.dst AS node FROM edges e
        JOIN f1 ON f1.node = e.src
        EXCEPT (SELECT node FROM d0 UNION ALL SELECT node FROM f1)),
    f3 AS (
        SELECT DISTINCT e.dst AS node FROM edges e
        JOIN f2 ON f2.node = e.src
        EXCEPT (SELECT node FROM d0 UNION ALL SELECT node FROM f1
                UNION ALL SELECT node FROM f2)),
    unreached AS (
        SELECT node FROM nodes
        EXCEPT (SELECT node FROM d0 UNION ALL SELECT node FROM f1
                UNION ALL SELECT node FROM f2
                UNION ALL SELECT node FROM f3))
    SELECT * FROM (
        SELECT 0 AS dist, CAST(count(*) AS BIGINT) AS n_nodes FROM d0
        UNION ALL SELECT 1, CAST(count(*) AS BIGINT) FROM f1
        UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM f2
        UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM f3
        UNION ALL SELECT -1, CAST(count(*) AS BIGINT) FROM unreached)
    ORDER BY dist
    """,
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first distance histogram from a deterministic seed (the
    lexicographically smallest node) over the undirected purchase graph:
    how much of the graph is within 1, 2, 3 hops, plus the unreached
    remainder — the reachability/diameter probe (and the building block
    of Pregel-style shortest paths; Malewicz et al., SIGMOD 2010).

    Each of the {BFS_ROUNDS} unrolled rounds is frontier-expand
    (equi-join frontier -> edges on the source key) then anti-join
    against the visited set — the exact message-passing step every BSP
    graph engine runs, expressed relationally. No broadcast hint on the
    frontier on purpose: round-1 frontiers are tiny but web-scale BFS
    frontiers explode by round 2, so the join must be allowed to stay a
    shuffle join (AQE broadcasts the small rounds on its own).

    Determinism: the seed is min(node) (byte-wise string order on both
    engines), expansion is set-valued (distinct/anti-join, no float, no
    tie-breaks needed); counts are exact.

    Scale shape: the edge list is persisted once (the pagerank lesson);
    per round, cost is one equi-join shuffle on the frontier keys plus
    one anti-join on the visited set — both hash-partitioned by node id,
    never all-pairs. The visited set grows monotonically but stays
    node-, not edge-, sized.
    """
    edges = _pr_edges(spark, sf_dir).persist()
    nodes = edges.select("src").distinct().persist()
    seed = nodes.agg(F.min("src").alias("node"))
    reached = seed.select("node", F.lit(0).alias("dist"))
    frontier = seed.select("node")
    for k in range(1, BFS_ROUNDS + 1):
        nxt = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = nxt.join(
            reached.select("node"), "node", "left_anti"
        ).persist()  # read twice: next round's expand + the visited union
        reached = reached.unionAll(
            frontier.select("node", F.lit(k).alias("dist"))
        )
    hist = reached.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    un = (
        nodes.withColumnRenamed("src", "node")
        .join(reached.select("node"), "node", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(F.lit(-1).alias("dist"), "n_nodes")
    )
    return (
        hist.unionAll(un)
        .select(F.col("dist").cast("int"), "n_nodes")
        .orderBy("dist")
    )


# --------------------------------------------------------------------------
# graph_degree_assortativity — degree-degree correlation across edges
# --------------------------------------------------------------------------

# Pearson over the (deg(src), deg(dst)) pairs of the doubled edge list —
# exactly Newman's assortativity coefficient r for an undirected graph
# (the doubling supplies both orientations the formula averages over).
_ASSORT_R = (
    "((m * sxy - sx * sy)"
    " / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)))"
)


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH e0 AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (
        SELECT 'c' || CAST(cust AS VARCHAR) AS src,
               's' || CAST(supp AS VARCHAR) AS dst FROM e0
        UNION ALL
        SELECT 's' || CAST(supp AS VARCHAR), 'c' || CAST(cust AS VARCHAR)
        FROM e0),
    deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS k
            FROM edges GROUP BY 1),
    st AS (
        SELECT CAST(count(*) AS DOUBLE) AS m,
               CAST(sum(CAST(ds.k AS HUGEINT)) AS DOUBLE) AS sx,
               CAST(sum(CAST(dd.k AS HUGEINT)) AS DOUBLE) AS sy,
               CAST(sum(CAST(ds.k AS HUGEINT) * ds.k) AS DOUBLE) AS sxx,
               CAST(sum(CAST(ds.k AS HUGEINT) * dd.k) AS DOUBLE) AS sxy,
               CAST(sum(CAST(dd.k AS HUGEINT) * dd.k) AS DOUBLE) AS syy
        FROM edges e
        JOIN deg ds ON ds.node = e.src
        JOIN deg dd ON dd.node = e.dst)
    SELECT CAST(m AS BIGINT) // 2 AS n_edges,
           {sql_stable_round4('(sx / m)')} AS mean_degree,
           {sql_stable_round4(_ASSORT_R)} AS assortativity
    FROM st
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the undirected purchase graph (Newman,
    PRL 2002): the Pearson correlation of the endpoint degrees over all
    edges. Positive r = hubs attach to hubs (social-network shape),
    negative r = hubs attach to leaves (the hub-and-spoke shape
    bipartite commerce graphs usually show) — the one-number structural
    fingerprint that decides whether degree-targeted sampling or
    skew-salting will be needed downstream.

    Determinism: degrees are exact counts, all five sufficient
    statistics are exact DECIMAL(38)/HUGEINT sums over the edge list,
    and the single r expression (IEEE sqrt of exact doubles) is
    interpolated verbatim into both engines; stable_round4 on the two
    reported rationals.

    Scale shape: the degree table is node-sized and the enrichment is
    two hash equi-joins of edges->degree on the endpoint keys — the
    standard message-passing join, hash-partitioned by node id, never
    all-pairs. The persisted doubled edge list is built once; one
    moment aggregate (map-side combined) finishes the job.
    """
    edges = _pr_edges(spark, sf_dir).persist()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    ds = deg.select(F.col("node").alias("sn"), F.col("k").alias("kx"))
    dd = deg.select(F.col("node").alias("dn"), F.col("k").alias("ky"))

    def dsum(expr: str) -> Column:
        return F.sum(F.expr(expr).cast("decimal(38,0)")).cast("double")

    # degree products are widened BEFORE the multiply: `kx * kx` under a
    # trailing decimal cast still evaluates the product in LONG, which
    # wraps for a hub of degree > ~3e9 (same IntegralDivide/overflow
    # class as the gini rank-sum, VERDICT r9 #1). The decimal multiply
    # runs once per edge row but the whole aggregate is a single pass.
    st = (
        edges.join(ds, edges.src == ds.sn)
        .join(dd, edges.dst == dd.dn)
        .agg(
            F.count(F.lit(1)).cast("double").alias("m"),
            dsum("kx").alias("sx"),
            dsum("ky").alias("sy"),
            dsum("CAST(kx AS DECIMAL(38,0)) * kx").alias("sxx"),
            dsum("CAST(kx AS DECIMAL(38,0)) * ky").alias("sxy"),
            dsum("CAST(ky AS DECIMAL(38,0)) * ky").alias("syy"),
        )
    )
    return st.selectExpr(
        "CAST(m AS BIGINT) div 2 AS n_edges",
        f"CAST({sql_stable_round4('(sx / m)')} AS DOUBLE) AS mean_degree",
        f"CAST({sql_stable_round4(_ASSORT_R)} AS DOUBLE) AS assortativity",
    )


# --------------------------------------------------------------------------
# graph_modularity — Newman Q of the label-propagation communities
# --------------------------------------------------------------------------

# Q = sum_c [ e2_c/M2 - (d_c/M2)^2 ] over the DOUBLED edge relation
# (M2 = 2m, e2_c counts intra-community rows = 2 * intra edges). With
# the common denominator M2^2 the per-community numerator
# e2_c*M2 - d_c^2 is an exact integer, so the community sum is a
# DECIMAL/HUGEINT sum — never k order-dependent doubles.
_MOD_Q = "(qnum / (m2 * m2))"


@register(
    "graph_modularity",
    oracle=f"""
    WITH {SQL_PAIRS},
    {SQL_LP2_LABELS},
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY 1),
    mm AS (SELECT CAST(count(*) AS HUGEINT) AS m2 FROM und),
    intra AS (
        SELECT la.lbl AS community, CAST(count(*) AS BIGINT) AS e2
        FROM und
        JOIN l2 la ON la.v = und.v
        JOIN l2 lb ON lb.v = und.n
        WHERE la.lbl = lb.lbl GROUP BY 1),
    dc AS (
        SELECT l2.lbl AS community,
               CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS dsum
        FROM deg JOIN l2 ON deg.v = l2.v GROUP BY 1),
    terms AS (
        SELECT dc.community,
               CAST(coalesce(e2, 0) AS HUGEINT) * m2 - dsum * dsum
                   AS qn
        FROM dc LEFT JOIN intra ON dc.community = intra.community
        CROSS JOIN mm),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_communities,
               CAST(sum(qn) AS DOUBLE) AS qnum
        FROM terms),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT n_nodes, n_communities,
           CAST(m2 AS BIGINT) // 2 AS n_edges,
           {sql_stable_round4(_MOD_Q)} AS modularity
    FROM agg CROSS JOIN nn
    CROSS JOIN (SELECT CAST(m2 AS DOUBLE) AS m2 FROM mm) md
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q (Newman & Girvan 2004) of the communities
    graph_label_propagation finds on the thinned co-purchase graph: the
    one-number answer to "did the community detection find real
    structure?" (Q near 0 = no better than random given the degree
    sequence; 0.3+ = strong communities). Composes the iterative LP
    operator with an exact quality functional — the evaluation half a
    clustering pipeline needs before trusting its segments.

    Determinism: the LP rounds are the registered deterministic ones
    (frequency vote, ties to smallest label, fixed 2 rounds — shared
    CTE text with graph_label_propagation's oracle so both engines see
    the SAME communities); with the common denominator M2^2 each
    community's numerator e2_c*M2 - d_c^2 is an exact integer, so the
    community sum never accumulates doubles. One division at the end,
    stable_round4.

    Scale shape: degree and intra-edge counts are node- and edge-keyed
    hash aggregates; the two label joins key on node id (the
    message-passing shape). The label frame is localCheckpoint-
    materialized by the LP loop, so the three references don't re-run
    the rounds; the doubled edge list is persisted once.
    """
    pairs = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2")
    und = (
        pairs.select(F.col("cust1").alias("v"), F.col("cust2").alias("n"))
        .unionAll(
            pairs.select(
                F.col("cust2").alias("v"), F.col("cust1").alias("n")
            )
        )
        .persist()  # degrees + M2 + intra all read it
    )
    labels = label_propagation(und, rounds=2)
    deg = und.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))
    mm = und.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m2"))
    la = labels.select(F.col("v"), F.col("community").alias("ca"))
    lb = labels.select(
        F.col("v").alias("n"), F.col("community").alias("cb")
    )
    intra = (
        und.join(la, "v")
        .join(lb, "n")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("e2"))
    )
    dc = (
        deg.join(labels, "v")
        .groupBy("community")
        .agg(F.sum(F.col("d").cast("decimal(38,0)")).alias("dsum"))
    )
    terms = (
        dc.join(intra, "community", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            (
                F.coalesce(F.col("e2"), F.lit(0)).cast("decimal(38,0)")
                * F.col("m2")
                - F.col("dsum") * F.col("dsum")
            ).alias("qn")
        )
    )
    agg = terms.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum("qn").cast("double").alias("qnum"),
    )
    nn = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    md = mm.select(F.col("m2").cast("double").alias("m2d"))
    return (
        agg.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(md))
        .selectExpr(
            "n_nodes",
            "n_communities",
            "CAST(m2 AS BIGINT) div 2 AS n_edges",
            f"CAST({sql_stable_round4(_MOD_Q.replace('m2', 'm2d'))}"
            " AS DOUBLE) AS modularity",
        )
    )


# --------------------------------------------------------------------------
# graph_katz_centrality — truncated Katz index with exact walk counts
# --------------------------------------------------------------------------

# Katz (1953) truncated at k=3 with alpha = 1/8: score = sum_k alpha^k *
# walks_k(v). Clearing alpha makes the numerator an EXACT integer,
# 64*w1 + 8*w2 + w3, and the one division by 512 = 2^9 is exact in
# binary floating point — this op has NO rounding anywhere.
KATZ_ALPHA_DEN = 8


@register(
    "graph_katz_centrality",
    oracle=f"""
    WITH {SQL_PAIRS},
    und AS (SELECT c1 AS v, c2 AS n FROM p
            UNION ALL SELECT c2 AS v, c1 AS n FROM p),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS w1 FROM und GROUP BY 1),
    w2t AS (SELECT und.v, CAST(sum(d.w1) AS BIGINT) AS w2
            FROM und JOIN deg d ON d.v = und.n GROUP BY 1),
    w3t AS (SELECT und.v, CAST(sum(t.w2) AS BIGINT) AS w3
            FROM und JOIN w2t t ON t.v = und.n GROUP BY 1)
    SELECT deg.v AS cust, deg.w1 AS degree,
           CAST((64 * deg.w1 + 8 * w2t.w2 + w3t.w3) AS DOUBLE) / 512.0
               AS katz_score
    FROM deg JOIN w2t ON deg.v = w2t.v JOIN w3t ON deg.v = w3t.v
    """,
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated Katz centrality (Katz 1953) on the thinned co-purchase
    graph: each node scored by its attenuated walk counts,
    sum_{{k<=3}} (1/8)^k * walks_k(v) — the centrality that sees BEYOND
    the immediate neighborhood (degree is k=1; Katz discounts but still
    credits 2- and 3-step reach), completing the centrality ladder
    degree -> PageRank -> HITS -> Katz.

    Exactness: walk counts are integers by construction (w2 = sum of
    neighbor degrees, w3 = sum of neighbor w2); clearing alpha = 1/8
    gives the integer numerator 64*w1 + 8*w2 + w3, and the single
    division by 512 = 2^9 is EXACT in binary floating point — the rare
    analytics op with zero rounding anywhere, no stable_round4 needed.

    Scale shape: textbook message passing — each walk order is ONE
    node-keyed equi-join + hash aggregate over the doubled edge list
    (persisted once); three bounded rounds, no iteration to
    convergence. At 100 TB the cost is 3 edge-keyed shuffles, exactly
    a 3-step GraphX/Pregel superstep sequence expressed relationally.
    """
    pairs = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2")
    und = (
        pairs.select(F.col("cust1").alias("v"), F.col("cust2").alias("n"))
        .unionAll(
            pairs.select(
                F.col("cust2").alias("v"), F.col("cust1").alias("n")
            )
        )
        .persist()  # degree + both message rounds read it
    )
    deg = und.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("w1"))
    w2t = (
        und.join(deg.select(F.col("v").alias("n"), "w1"), "n")
        .groupBy("v")
        .agg(F.sum("w1").cast("long").alias("w2"))
    )
    w3t = (
        und.join(w2t.select(F.col("v").alias("n"), "w2"), "n")
        .groupBy("v")
        .agg(F.sum("w2").cast("long").alias("w3"))
    )
    return (
        deg.join(w2t, "v")
        .join(w3t, "v")
        .select(
            F.col("v").alias("cust"),
            F.col("w1").alias("degree"),
            (
                (64 * F.col("w1") + 8 * F.col("w2") + F.col("w3")).cast(
                    "double"
                )
                / 512.0
            ).alias("katz_score"),
        )
    )


# --------------------------------------------------------------------------
# graph_ktruss — k-truss edge peeling (K = 4, two unrolled rounds)
# --------------------------------------------------------------------------

KTRUSS_K = 4  # an edge survives iff it sits in >= K-2 triangles


def _truss_round_sql(k: int, src: str) -> str:
    """One unrolled truss round over edge CTE ``src``: enumerate ordered
    triangles, count per-edge support, keep edges with support >= K-2."""
    return f"""
    tri{k} AS (
        SELECT e1.c1 AS a, e1.c2 AS b, e2.c2 AS c
        FROM {src} e1
        JOIN {src} e2 ON e1.c2 = e2.c1
        JOIN {src} e3 ON e3.c1 = e1.c1 AND e3.c2 = e2.c2),
    sup{k} AS (
        SELECT c1, c2, CAST(count(*) AS BIGINT) AS supp
        FROM (SELECT a AS c1, b AS c2 FROM tri{k}
              UNION ALL SELECT a, c FROM tri{k}
              UNION ALL SELECT b, c FROM tri{k})
        GROUP BY 1, 2),
    e{k + 1} AS (SELECT c1, c2 FROM sup{k}
                 WHERE supp >= {KTRUSS_K - 2})"""


@register(
    "graph_ktruss",
    oracle=f"""
    WITH {SQL_PAIRS},
    e1 AS (SELECT c1, c2 FROM p),
    {_truss_round_sql(1, "e1")},
    {_truss_round_sql(2, "e2")}
    SELECT c1 AS cust1, c2 AS cust2, supp AS support
    FROM sup2 WHERE supp >= {KTRUSS_K - 2}
    ORDER BY cust1, cust2
    """,
)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KTRUSS_K}-truss of the co-purchase graph (Cohen 2008), two
    unrolled peel rounds: an edge survives only while it participates in
    >= {KTRUSS_K - 2} triangles OF THE SURVIVING SUBGRAPH — the
    edge-side sibling of graph_kcore's vertex peeling, and the standard
    community-core extractor (a k-truss edge is inside a dense clique-
    ish region; bridges and spokes peel away). Output: surviving edges
    with their final-round support.

    Determinism: triangle enumeration is the ordered a<b<c join (each
    triangle counted once); supports are exact integer counts; the peel
    threshold is an integer compare. No floats anywhere.

    Scale shape: the triangle join is the graph_triangle_count shape
    (edge-keyed equi-joins on the ordered edge list, never a cartesian);
    each round re-runs it on a STRICTLY SMALLER persisted edge set.
    Rounds are fixed at 2 (most edges converge immediately; a full
    fixpoint is the same plan iterated), so the plan is static.
    """
    pairs = _copurchase_pairs(spark, sf_dir).select(
        F.col("cust1").alias("c1"), F.col("cust2").alias("c2")
    )
    edges = pairs.persist()
    sup = None
    for k in (1, 2):
        e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
        tri = (
            e1.join(e2, F.col("e1.c2") == F.col("e2.c1"))
            .join(
                e3,
                (F.col("e3.c1") == F.col("e1.c1"))
                & (F.col("e3.c2") == F.col("e2.c2")),
            )
            .select(
                F.col("e1.c1").alias("a"),
                F.col("e1.c2").alias("b"),
                F.col("e2.c2").alias("c"),
            )
        )
        # all three triangle edges exploded from ONE tri relation — the
        # 2-unionAll form re-executed the 3-way triangle join three times
        # per round (plans/r10/graph_ktruss_{before,after}.txt)
        sup = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("a").alias("c1"), F.col("b").alias("c2")
                        ),
                        F.struct(
                            F.col("a").alias("c1"), F.col("c").alias("c2")
                        ),
                        F.struct(
                            F.col("b").alias("c1"), F.col("c").alias("c2")
                        ),
                    )
                ).alias("e")
            )
            .groupBy(F.col("e.c1").alias("c1"), F.col("e.c2").alias("c2"))
            .agg(F.count(F.lit(1)).cast("long").alias("supp"))
        )
        edges = sup.filter(F.col("supp") >= KTRUSS_K - 2).select(
            "c1", "c2"
        ).persist()
    return (
        sup.filter(F.col("supp") >= KTRUSS_K - 2)
        .select(
            F.col("c1").alias("cust1"),
            F.col("c2").alias("cust2"),
            F.col("supp").alias("support"),
        )
        .orderBy("cust1", "cust2")
    )


# --------------------------------------------------------------------------
# graph_ppr — personalized PageRank (seeded restart, 3 quantized rounds)
# --------------------------------------------------------------------------

PPR_SCALE = 1 << 20   # integer mass scale (power of two: /S is exact)
PPR_SEED_MOD = 50     # seeds: customers with custkey % 50 == 0
PPR_ROUNDS = 3


def _ppr_round_sql(k: int) -> str:
    prev = f"r{k - 1}"
    return f"""
    m{k} AS (
        SELECT und.v, CAST(sum({prev}.s // deg_n.w) AS BIGINT) AS m
        FROM und
        JOIN {prev} ON {prev}.v = und.n
        JOIN (SELECT v, w1 AS w FROM deg) deg_n ON deg_n.v = und.n
        GROUP BY 1),
    r{k} AS (
        SELECT deg.v,
               CAST(coalesce(m{k}.m, 0) // 2
                    + CASE WHEN deg.v % {PPR_SEED_MOD} = 0
                           THEN {PPR_SCALE} // 2 ELSE 0 END AS BIGINT) AS s
        FROM deg LEFT JOIN m{k} ON m{k}.v = deg.v)"""


@register(
    "graph_ppr",
    oracle=f"""
    WITH {SQL_PAIRS},
    und AS (SELECT c1 AS v, c2 AS n FROM p
            UNION ALL SELECT c2 AS v, c1 AS n FROM p),
    deg AS (SELECT v, CAST(count(*) AS BIGINT) AS w1 FROM und GROUP BY 1),
    r0 AS (
        SELECT v, CAST(CASE WHEN v % {PPR_SEED_MOD} = 0
                            THEN {PPR_SCALE} ELSE 0 END AS BIGINT) AS s
        FROM deg),
    {','.join(_ppr_round_sql(k) for k in range(1, PPR_ROUNDS + 1))}
    SELECT r{PPR_ROUNDS}.v AS cust,
           deg.w1 AS degree,
           (deg.v % {PPR_SEED_MOD} = 0) AS is_seed,
           CAST(r{PPR_ROUNDS}.s AS DOUBLE) / {PPR_SCALE} AS ppr_score
    FROM r{PPR_ROUNDS} JOIN deg ON deg.v = r{PPR_ROUNDS}.v
    WHERE r{PPR_ROUNDS}.s > 0
    """,
)
def graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a deterministic seed set (every
    {PPR_SEED_MOD}th customer) on the co-purchase graph — the
    seed-proximity ranking behind "related to THESE nodes" retrieval
    (graph-side RAG expansion, account-ring scoring), vs the global
    importance graph_pagerank computes. Restart probability 1/2,
    {PPR_ROUNDS} unrolled rounds.

    QUANTIZED-INTEGER push: mass lives at scale 2^20; each round every
    node pushes s div deg to each neighbor and keeps
    (received div 2) + seed restart — all BIGINT floor divisions, so both
    engines walk the identical integer trajectory (the deliberate
    quantization of the classic float PPR; the final /2^20 is exact in
    binary). Nodes with zero round-{PPR_ROUNDS} mass are filtered — the
    output is the seed neighborhood, not the whole graph.

    Scale shape: {PPR_ROUNDS} node-keyed equi-join + aggregate rounds
    over the persisted doubled edge list — relational Pregel supersteps,
    like graph_katz_centrality but seed-restarted and normalized."""
    pairs = _copurchase_pairs(spark, sf_dir).select("cust1", "cust2")
    und = (
        pairs.select(F.col("cust1").alias("v"), F.col("cust2").alias("n"))
        .unionAll(
            pairs.select(F.col("cust2").alias("v"), F.col("cust1").alias("n"))
        )
        .persist()
    )
    deg = und.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("w1"))
    is_seed = F.col("v") % PPR_SEED_MOD == 0
    r = deg.select(
        "v",
        F.when(is_seed, F.lit(PPR_SCALE)).otherwise(0).cast("long").alias("s"),
    )
    for _ in range(PPR_ROUNDS):
        msg = (
            und.join(r.select(F.col("v").alias("n"), "s"), "n")
            .join(
                deg.select(F.col("v").alias("n"), F.col("w1").alias("w")),
                "n",
            )
            .groupBy("v")
            .agg(F.sum(F.expr("s div w")).cast("long").alias("m"))
        )
        r = deg.join(msg, "v", "left").select(
            "v",
            (
                F.expr("coalesce(m, 0L) div 2")
                + F.when(is_seed, F.lit(PPR_SCALE // 2)).otherwise(0)
            )
            .cast("long")
            .alias("s"),
        )
    return (
        r.filter(F.col("s") > 0)
        .join(deg, "v")
        .select(
            F.col("v").alias("cust"),
            F.col("w1").alias("degree"),
            is_seed.alias("is_seed"),
            (F.col("s").cast("double") / PPR_SCALE).alias("ppr_score"),
        )
    )
