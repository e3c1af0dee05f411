"""Iterative graph analytics over the near-duplicate candidate graph.

The reference has no graph surface at all (its only iteration is the
boosting loop, `sparkdl/xgboost/xgboost_core.py:413-418`); this extends
the dedup pipeline's LSH candidate graph (operators/dedup.py) with the
second classic iterative-algorithm shape after connected components:
PageRank. In an LLM-data pipeline the rank over the near-dup graph is a
centrality score for boilerplate hubs — documents near-duplicating MANY
others (templates, mirrors) rank high and get dropped first.

Scale shape: each iteration is one join + one groupBy over the EDGE
list — the standard map-reduce PageRank recipe that holds at any graph
size. A FIXED iteration count (no convergence collect) keeps the whole
computation ONE lazy plan: no driver round-trips, no checkpoint needed
at 3 iterations (plan depth is bounded and known).

All arithmetic is integer nano-rank units: per-edge contributions use
integer division, so sums are exact BIGINTs under any partition order
and the DuckDB oracle unrolls the identical three iterations —
bit-for-bit, like every other quantized aggregate in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_xgboost_spark.operators.dedup import (
    _MINHASH_CAND_SQL,
    _cached_candidate_pairs,
)
from pyspark_xgboost_spark.registry import register
from pyspark_xgboost_spark.sources import load_table

_ITERS = 3
_SCALE = 1_000_000_000  # nano-rank units
_D_NUM, _D_DEN = 85, 100  # damping 0.85 as an exact ratio


def _pagerank_iter_sql(prev: str, out: str) -> str:
    """One unrolled PageRank iteration in DuckDB SQL (integer units).

    `//` is DuckDB integer division; Spark's `div` matches it exactly
    on the non-negative operands used here."""
    return f"""
    {out} AS (
      SELECT n.doc_id, n.outdeg,
             (150000000 // (SELECT n FROM nn)) + COALESCE(s.contrib, 0) AS pr
      FROM {prev} n LEFT JOIN (
        SELECT e.dst AS doc_id,
               SUM((p.pr * {_D_NUM}) // ({_D_DEN} * p.outdeg)) AS contrib
        FROM edges e JOIN {prev} p ON e.src = p.doc_id
        GROUP BY e.dst
      ) s USING (doc_id)
    )"""


@register(
    "graph_pagerank_fixed",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    deg AS (SELECT src AS doc_id, count(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    pr0 AS (
      SELECT doc_id, outdeg,
             ({_SCALE} // (SELECT n FROM nn)) AS pr
      FROM deg
    ),
    {_pagerank_iter_sql("pr0", "pr1")},
    {_pagerank_iter_sql("pr1", "pr2")},
    {_pagerank_iter_sql("pr2", "pr3")}
    SELECT doc_id, CAST(pr AS BIGINT) AS pagerank_nano FROM pr3
    """,
)
def graph_pagerank_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed iterations) over the undirected
    MinHash-LSH candidate graph, in exact integer nano-rank units.

    Spark shape: rank lives on the node relation; each iteration joins
    ranks onto the edge list, floor-divides each node's outgoing rank
    share ONCE per edge (integer div — exact, associative sums), groups
    by destination, and adds the teleport term. Three iterations = one
    lazy plan with three join+agg stages, each shuffling O(edges) rows
    hashed on doc_id; no driver interaction at all. The bucket cap that
    bounds LSH pair expansion (dedup.py) also bounds the max degree,
    so no rank hot-spot task exists. Dangling nodes cannot occur: every
    node in the graph has, by construction, at least the edge that put
    it there.
    """
    return pagerank(
        _lsh_edges(spark, sf_dir), n_iters=_ITERS, checkpoint_every=0
    )


_EDGES_CACHE: dict[str, DataFrame] = {}


def _lsh_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected MinHash-LSH candidate edge list, materialized once
    (localCheckpoint) so LSH never re-runs per unrolled iteration —
    and MEMOIZED per (session, source fingerprint): eight graph
    queries consume this identical edge table (the dedup
    _cached_candidate_pairs discipline; the pairs themselves come
    from that shared cache too)."""
    from pyspark_xgboost_spark.sources.formats import memo_by_fingerprint

    def build() -> DataFrame:
        pairs = _cached_candidate_pairs(spark, sf_dir)
        edges = pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        return edges.localCheckpoint(eager=True)

    return memo_by_fingerprint(_EDGES_CACHE, spark, sf_dir, "documents", build)


def pagerank(
    edges: DataFrame, n_iters: int = _ITERS, checkpoint_every: int = 3
) -> DataFrame:
    """PageRank over an (src, dst) edge DataFrame in exact integer
    nano-rank units; returns (doc_id, pagerank_nano).

    ``checkpoint_every=k`` truncates lineage with an eager
    localCheckpoint every k iterations — the same discipline as
    dedup_groups_connected (dedup.py:351-420). Each unrolled iteration
    adds a join+agg stage to the plan; without truncation the plan
    (and its Janino codegen time) grows linearly with n_iters, and a
    real centrality job runs 10-50 iterations. With it, plan depth is
    bounded by k regardless of n_iters. ``checkpoint_every=0``
    disables truncation (right for <=3 iterations, where one lazy plan
    with zero materialization barriers is cheaper).

    Integer arithmetic makes checkpointing result-neutral: floor-div
    shares and BIGINT sums are exact under any partition order, so the
    checkpointed and one-plan forms are bit-identical (pinned by
    test_pagerank_checkpoint_result_neutral).
    """
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_nodes = deg.count()  # scalar: sizes the teleport term, not data
    nodes = deg.withColumnRenamed("src", "doc_id")

    pr = nodes.withColumn("pr", F.lit(_SCALE // n_nodes).cast("bigint"))
    teleport = 150_000_000 // n_nodes  # (1-d) * SCALE / N, exact
    for it in range(1, n_iters + 1):
        contrib = (
            edges.join(pr, edges["src"] == pr["doc_id"])
            .select(
                "dst",
                F.expr(f"(pr * {_D_NUM}) div ({_D_DEN} * outdeg)").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        pr = (
            pr.join(contrib, pr["doc_id"] == contrib["dst"], "left")
            .select(
                "doc_id",
                "outdeg",
                (
                    F.lit(teleport) + F.coalesce(F.col("contrib"), F.lit(0))
                ).cast("bigint").alias("pr"),
            )
        )
        if checkpoint_every and it % checkpoint_every == 0 and it < n_iters:
            pr = pr.localCheckpoint(eager=True)
    return pr.select("doc_id", F.col("pr").alias("pagerank_nano"))


_DEEP_ITERS = 6


@register(
    "graph_pagerank_deep",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    deg AS (SELECT src AS doc_id, count(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM deg),
    pr0 AS (
      SELECT doc_id, outdeg,
             ({_SCALE} // (SELECT n FROM nn)) AS pr
      FROM deg
    ),
    {_pagerank_iter_sql("pr0", "pr1")},
    {_pagerank_iter_sql("pr1", "pr2")},
    {_pagerank_iter_sql("pr2", "pr3")},
    {_pagerank_iter_sql("pr3", "pr4")},
    {_pagerank_iter_sql("pr4", "pr5")},
    {_pagerank_iter_sql("pr5", "pr6")}
    SELECT doc_id, CAST(pr AS BIGINT) AS pagerank_nano FROM pr6
    """,
)
def graph_pagerank_deep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank at real-job depth: 6 iterations with lineage truncation
    every 3 (localCheckpoint) — the checkpointed execution path under
    the exact-oracle gate. The DuckDB oracle unrolls the identical 6
    integer iterations; because every share is an exact floor-div and
    every sum a BIGINT, the checkpoint barriers cannot change a single
    bit, so the hash compare proves checkpointing is result-neutral on
    the driver's own data."""
    return pagerank(
        _lsh_edges(spark, sf_dir), n_iters=_DEEP_ITERS, checkpoint_every=3
    )


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM cand e1
      JOIN cand e2 ON e2.doc_a = e1.doc_b
      JOIN cand e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    )
    SELECT node AS doc_id, count(*) AS tri_cnt FROM (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ) nodes
    GROUP BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the MinHash-LSH candidate graph —
    the local-clustering signal that separates tight mirror clusters
    (every near-dup of mine also near-dups each other: template farms,
    boilerplate families) from chain-like coincidental collisions.

    Algorithm: the standard ordered-wedge closure on the CANONICAL
    (doc_a < doc_b) edge list — each triangle a<b<c is found exactly
    once by joining (a,b)+(b,c) wedges against the closing (a,c) edge.
    No node ever sees its full neighborhood in one task.

    Scale shape: two shuffles of the edge list (wedge build on b, then
    closure probe on (a,c)); wedge fan-out is bounded because the LSH
    bucket cap (dedup._MH_BUCKET_CAP) bounds the max degree, so the
    intermediate wedge relation is O(edges x maxdeg) with a small
    constant — the same bound that makes the PageRank contributions
    hot-spot-free. The per-node count is a final map-side-combined
    groupBy over 3 rows per triangle."""
    pairs = _cached_candidate_pairs(spark, sf_dir)
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = e1.join(e2, F.col("b") == F.col("b2")).join(
        e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3"))
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy(F.col("node").alias("doc_id")).agg(
        F.count("*").alias("tri_cnt")
    )


# --------------------------------------------------------------------------
# BFS hop distance (bounded multi-source breadth-first search)
# --------------------------------------------------------------------------

_BFS_MAX_HOPS = 3


@register(
    "graph_bfs_hops",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    seeds AS (
      SELECT DISTINCT src AS doc_id FROM edges WHERE src % 10 = 0
    ),
    walk(doc_id, hops) AS (
      SELECT doc_id, 0 FROM seeds
      UNION
      SELECT e.dst, w.hops + 1
      FROM walk w JOIN edges e ON e.src = w.doc_id
      WHERE w.hops < {_BFS_MAX_HOPS}
    ),
    dist AS (SELECT doc_id, min(hops) AS hops FROM walk GROUP BY doc_id)
    SELECT hops, count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM dist
    GROUP BY hops
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS over the LSH similarity graph: hop
    distance from a deterministic seed set (every 10th doc that has an
    edge), frontier-expanded {_BFS_MAX_HOPS} rounds — the
    neighborhood-expansion primitive behind contamination blast-radius
    ("everything within 2 hops of a benchmark document") and
    graph-based label propagation.

    Spark shape: per round, ONE join of the CURRENT FRONTIER against
    the edge list + an aggregate keeping the minimum hop count —
    frontier rows shrink as distances settle, and the hop bound caps
    the rounds, so the plan is {_BFS_MAX_HOPS} join+agg stages over
    O(edges). The distance table replaces per-node visited state; no
    driver-side traversal."""
    edges = _lsh_edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("doc_id"))
        .filter(F.col("doc_id") % 10 == 0)
        .distinct()
    )
    dist = seeds.withColumn("hops", F.lit(0))
    frontier = dist
    for hop in range(1, _BFS_MAX_HOPS + 1):
        reached = (
            frontier.join(edges, frontier["doc_id"] == edges["src"])
            .select(F.col("dst").alias("doc_id"), F.lit(hop).alias("hops"))
            .distinct()
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("doc_id")
            .agg(F.min("hops").alias("hops"))
        )
        # next frontier: nodes whose settled distance IS this hop
        frontier = dist.filter(F.col("hops") == hop)
    return dist.groupBy("hops").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_LPA_ITERS = 3


def _lpa_iter_sql(prev: str, out: str) -> str:
    """One unrolled synchronous label-propagation round in DuckDB SQL:
    each node adopts the most frequent label among its NEIGHBORS, ties
    to the smallest label — a total order, so the round is a pure
    function of the previous labeling."""
    return f"""
    {out} AS (
      SELECT doc_id, label FROM (
        SELECT e.dst AS doc_id, p.label,
               row_number() OVER (
                 PARTITION BY e.dst
                 ORDER BY count(*) DESC, p.label ASC) AS rn
        FROM edges e JOIN {prev} p ON e.src = p.doc_id
        GROUP BY e.dst, p.label)
      WHERE rn = 1
    )"""


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    lp0 AS (SELECT DISTINCT src AS doc_id, src AS label FROM edges),
    {_lpa_iter_sql("lp0", "lp1")},
    {_lpa_iter_sql("lp1", "lp2")},
    {_lpa_iter_sql("lp2", "lp3")}
    SELECT label AS community_id,
           count(*) AS n_members,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_ids
    FROM lp3
    GROUP BY label
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan
    et al., Phys. Rev. E 76, 2007) over the MinHash-LSH candidate
    graph — the third classic iterative-graph shape here after
    connected components and PageRank. Communities on the near-dup
    graph are template families: clusters of documents that share
    boilerplate and should be sampled as a GROUP, not independently —
    connected components merges through any single spurious edge,
    while LPA's majority vote resists such bridges.

    Everything nondeterministic in textbook LPA is pinned:
    synchronous rounds (labels update from the PREVIOUS round only),
    fixed {_LPA_ITERS} iterations, neighbor-majority vote with ties
    broken to the SMALLEST label, seeds = own doc_id. Integer labels
    + integer counts mean the DuckDB unroll matches hash-exactly.

    Scale shape: one round = join labels onto the edge list, count
    per (node, label), keep the arg-max — two partial-agg exchanges
    over O(edges) rows, same recipe as PageRank's contribution sum;
    the LSH bucket cap bounds the vote fan-in. The arg-max is
    min(struct(-count, label)) — a partial-aggregable expression, NOT
    a window, so no per-node sort at scale."""
    edges = _lsh_edges(spark, sf_dir)
    labels = edges.select(F.col("src").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("label")
    )
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            votes.groupBy("dst")
            .agg(
                F.min(
                    F.struct((-F.col("cnt")).alias("neg"), F.col("label"))
                ).alias("m")
            )
            .select(F.col("dst").alias("doc_id"), F.col("m.label").alias("label"))
        )
    return labels.groupBy("label").agg(
        F.count("*").alias("n_members"),
        F.min("doc_id").alias("min_doc_id"),
        F.sum("doc_id").alias("sum_doc_ids"),
    ).select(
        F.col("label").alias("community_id"),
        "n_members",
        "min_doc_id",
        "sum_doc_ids",
    )


_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_round_sql(prev: str, out: str) -> str:
    return f"""
    keep{out} AS (
      SELECT src AS doc_id FROM {prev}
      GROUP BY src HAVING count(*) >= {_KCORE_K}
    ),
    {out} AS (
      SELECT e.src, e.dst FROM {prev} e
      JOIN keep{out} a ON a.doc_id = e.src
      JOIN keep{out} b ON b.doc_id = e.dst
    )"""


@register(
    "graph_kcore_peel",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    e0 AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    {_kcore_round_sql("e0", "e1")},
    {_kcore_round_sql("e1", "e2")},
    {_kcore_round_sql("e2", "e3")}
    SELECT 0 AS round,
           CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_directed_edges FROM e0
    UNION ALL SELECT 1, count(DISTINCT src), count(*) FROM e1
    UNION ALL SELECT 2, count(DISTINCT src), count(*) FROM e2
    UNION ALL SELECT 3, count(DISTINCT src), count(*) FROM e3
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CORE PEELING (bounded rounds) over the near-dup candidate
    graph — the density filter behind boilerplate-hub mining: each
    round removes every node with degree < {_KCORE_K} and the edges
    touching it; what survives repeated peeling is the densely
    interlinked template core (where PageRank finds HUBS, the k-core
    finds the dense SUBGRAPH — complementary centrality). Three
    rounds are unrolled; full coreness iterates the same round to a
    fixpoint (O(peeling-depth) rounds with the localCheckpoint
    discipline — this graph reaches its 3-core fixpoint within the
    unroll, which the shrinking row counts in the output show).

    Scale shape: one degree aggregate + two semi-join-shaped hash
    joins per round, all O(edges) with partial aggregation; the
    surviving edge list shrinks monotonically so later rounds cost
    less, and per-round lineage truncation keeps plan depth flat."""
    edges = _lsh_edges(spark, sf_dir)
    summaries = [
        edges.agg(
            F.lit(0).alias("round"),
            F.count_distinct("src").cast("bigint").alias("n_nodes"),
            F.count("*").cast("bigint").alias("n_directed_edges"),
        )
    ]
    cur = edges
    for rnd in range(1, _KCORE_ROUNDS + 1):
        keep = (
            cur.groupBy("src")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select(F.col("src").alias("doc_id"))
        )
        cur = (
            cur.join(keep.withColumnRenamed("doc_id", "src"), "src", "semi")
            .join(keep.withColumnRenamed("doc_id", "dst"), "dst", "semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        summaries.append(
            cur.agg(
                F.lit(rnd).alias("round"),
                F.count_distinct("src").cast("bigint").alias("n_nodes"),
                F.count("*").cast("bigint").alias("n_directed_edges"),
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.select(
        F.col("round").cast("int").alias("round"),
        "n_nodes",
        "n_directed_edges",
    )


@register(
    "graph_link_prediction_jaccard",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
    common AS (
      SELECT e1.src AS a, e2.src AS c, count(*) AS cn
      FROM edges e1 JOIN edges e2
        ON e1.dst = e2.dst AND e1.src < e2.src
      GROUP BY e1.src, e2.src
    )
    SELECT n.a AS src, n.c AS dst,
           CAST(n.cn AS BIGINT) AS common_neighbors,
           CAST(floor(n.cn * 1000000.0 / (da.d + dc.d - n.cn)) AS BIGINT)
             AS jaccard_micro,
           CAST(CASE WHEN EXISTS (
             SELECT 1 FROM cand WHERE doc_a = n.a AND doc_b = n.c)
             THEN 1 ELSE 0 END AS BIGINT) AS already_linked
    FROM common n
    JOIN deg da ON da.node = n.a
    JOIN deg dc ON dc.node = n.c
    """,
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK PREDICTION by neighbor-set Jaccard (Liben-Nowell & Kleinberg
    2003) over the near-dup candidate graph: for every non-adjacent node
    pair sharing at least one common neighbor, score
    |N(a) n N(c)| / |N(a) u N(c)|, flagging whether the pair is
    already a candidate edge. In the dedup pipeline the
    already_linked=0 rows are the transitive-miss detector — two docs
    that each near-dup the same third docs but missed each other's LSH
    bucket (banding's known false-negative mode) surface as
    high-Jaccard predicted edges, the candidates a second verification
    pass should check first; the already_linked=1 rows grade existing
    edges by neighborhood support (a confidence score for free).

    Algorithm: common-neighbor counts come from the ordered wedge join
    (e1.dst = e2.dst, src ordered so each pair counts once); the union
    size is deg(a) + deg(c) - common (inclusion-exclusion, never a
    set materialization); the already_linked flag comes from a left
    join against the canonical pair list.

    Scale shape: one shuffle of the edge list on the shared-neighbor
    key builds wedges (fan-out bounded by the LSH bucket cap exactly
    as in graph_triangle_count), one partial-agg exchange counts per
    pair, degree joins ride dimension-sized relations. Jaccard is an
    exact integer ratio floored to micro units — cross-engine stable."""
    pairs = _cached_candidate_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("c"), F.col("dst").alias("b2"))
    common = (
        e1.join(e2, (F.col("b") == F.col("b2")) & (F.col("a") < F.col("c")))
        .groupBy("a", "c")
        .agg(F.count("*").alias("cn"))
    )
    linked = common.join(
        pairs.select(
            F.col("doc_a").alias("a"),
            F.col("doc_b").alias("c"),
            F.lit(1).alias("already"),
        ),
        ["a", "c"],
        "left",
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("node").alias("c"), F.col("d").alias("dc"))
    return (
        linked.join(da, "a")
        .join(dc, "c")
        .select(
            F.col("a").alias("src"),
            F.col("c").alias("dst"),
            F.col("cn").cast("bigint").alias("common_neighbors"),
            F.floor(
                F.col("cn") * 1000000 / (F.col("da") + F.col("dc") - F.col("cn"))
            )
            .cast("bigint")
            .alias("jaccard_micro"),
            F.coalesce("already", F.lit(0)).cast("bigint").alias("already_linked"),
        )
    )


_SSSP_ROUNDS = 3
_SSSP_INF = 10**15


def _sssp_iter_sql(prev: str, out: str) -> str:
    """One unrolled Bellman-Ford relaxation in DuckDB (exact integer
    distances; INF-sourced relaxations exceed INF and lose the min)."""
    return f"""
    {out} AS (
      SELECT n.doc_id, least(n.d, COALESCE(m.md, n.d)) AS d
      FROM {prev} n LEFT JOIN (
        SELECT e.dst AS doc_id, min(p.d + e.wt) AS md
        FROM edges e JOIN {prev} p ON e.src = p.doc_id
        GROUP BY e.dst
      ) m USING (doc_id)
    )"""


@register(
    "graph_sssp_bounded",
    oracle=f"""
    WITH {_MINHASH_CAND_SQL},
    tsets AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(text),
                                                          '[ \\t\\n\\f\\r]+'),
                                       t -> t <> '')) AS tokset
      FROM documents
    ),
    we AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_distinct(a.tokset || b.tokset))
                  - len(list_intersect(a.tokset, b.tokset)) AS BIGINT)
               AS wt
      FROM cand c
      JOIN tsets a ON a.doc_id = c.doc_a
      JOIN tsets b ON b.doc_id = c.doc_b
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst, wt FROM we
      UNION ALL SELECT doc_b, doc_a, wt FROM we
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    s AS (SELECT min(doc_id) AS sid FROM nodes),
    d0 AS (
      SELECT n.doc_id,
             CASE WHEN n.doc_id = s.sid THEN 0 ELSE {_SSSP_INF} END AS d
      FROM nodes n CROSS JOIN s
    ),
    {",".join(_sssp_iter_sql(f"d{k - 1}", f"d{k}") for k in range(1, _SSSP_ROUNDS + 1))}
    SELECT doc_id, CAST(d AS BIGINT) AS dist
    FROM d{_SSSP_ROUNDS} WHERE d < {_SSSP_INF}
    """,
)
def graph_sssp_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOUNDED-HOP WEIGHTED SHORTEST PATHS (Bellman-Ford,
    {_SSSP_ROUNDS} synchronous relaxation rounds) from the lowest
    doc_id in the MinHash-LSH candidate graph, with edge weight = the
    token-set SYMMETRIC-DIFFERENCE size between the two documents — an
    exact integer dissimilarity, so path lengths are exact BIGINTs and
    the min-relaxation is partial-agg-order-proof (the weighted
    complement to graph_bfs_hops' unit-hop frontier). After k rounds
    every node holds the exact shortest distance among paths of <= k
    edges — the bounded-horizon form a production graph job runs
    (full convergence is the same loop with the CC stopping rule).

    Spark shape: the weighted edge list materializes once (candidate
    pairs join the token-set table twice on doc_id — the
    dedup_ngram_jaccard join discipline — then localCheckpoint);
    each round is one join + one map-side-combinable min aggregate
    hashed on doc_id, all {_SSSP_ROUNDS} rounds in a single lazy plan
    (the <=3-iteration PageRank discipline). Unreached nodes carry an
    integer INF sentinel ({_SSSP_INF}) that relaxation arithmetic
    cannot confuse with a real path (max real weight x diameter is
    orders below it); they are filtered at the end."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _cached_candidate_pairs(spark, sf_dir)
    d = docs.select("doc_id", "text")

    def tokset(col: str) -> F.Column:
        return F.array_distinct(
            F.expr(rf"filter(split(lower({col}), '[ \\t\\n\\f\\r]+'), t -> t != '')")
        )

    j = (
        F.broadcast(pairs)
        .join(d.alias("da"), F.col("doc_a") == F.col("da.doc_id"))
        .join(d.alias("db"), F.col("doc_b") == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            tokset("da.text").alias("ta"),
            tokset("db.text").alias("tb"),
        )
    )
    we = j.select(
        "doc_a",
        "doc_b",
        (
            F.size(F.array_union(F.col("ta"), F.col("tb")))
            - F.size(F.array_intersect(F.col("ta"), F.col("tb")))
        )
        .cast("bigint")
        .alias("wt"),
    )
    edges = we.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"), "wt"
    ).union(
        we.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"), "wt")
    )
    edges = edges.localCheckpoint(eager=True)  # LSH + scoring once
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    s = nodes.agg(F.min("doc_id").alias("sid"))
    dist = nodes.crossJoin(F.broadcast(s)).select(
        "doc_id",
        F.when(F.col("doc_id") == F.col("sid"), F.lit(0))
        .otherwise(F.lit(_SSSP_INF))
        .cast("bigint")
        .alias("d"),
    )
    for _ in range(_SSSP_ROUNDS):
        m = (
            edges.join(dist, edges["src"] == dist["doc_id"])
            .select("dst", (F.col("d") + F.col("wt")).alias("cand"))
            .groupBy("dst")
            .agg(F.min("cand").alias("md"))
        )
        dist = dist.join(m, dist["doc_id"] == m["dst"], "left").select(
            "doc_id",
            F.least(F.col("d"), F.coalesce(F.col("md"), F.col("d"))).alias("d"),
        )
    return dist.filter(F.col("d") < _SSSP_INF).select(
        "doc_id", F.col("d").cast("bigint").alias("dist")
    )


_BIGRAM_EDGES_SQL = r"""toksba AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \t\n\f\r]+'),
                         t -> t <> '') AS toks
      FROM documents
    ),
    bigba AS (
      SELECT toks[i] AS l, toks[i+1] AS r
      FROM toksba, LATERAL unnest(generate_series(1, len(toks) - 1)) AS g(i)
      WHERE len(toks) >= 2 AND toks[i] <> toks[i+1]
    ),
    wedges AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
        SELECT l AS src, r AS dst FROM bigba
        UNION ALL SELECT r, l FROM bigba
      ) GROUP BY src, dst
    )"""


@register(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_BIGRAM_EDGES_SQL},
    deg AS (
      SELECT src, CAST(sum(w) AS BIGINT) AS d FROM wedges GROUP BY src
    ),
    ed AS (
      SELECT e.w, ds.d AS x, dd.d AS y
      FROM wedges e
      JOIN deg ds ON e.src = ds.src
      JOIN deg dd ON e.dst = dd.src
    ),
    s AS (
      SELECT CAST(sum(w) AS BIGINT) AS n,
             CAST(sum(w * x) AS BIGINT) AS sx,
             CAST(sum(w * y) AS BIGINT) AS sy,
             CAST(sum(w * x * x) AS BIGINT) AS sxx,
             CAST(sum(w * y * y) AS BIGINT) AS syy,
             CAST(sum(w * x * y) AS BIGINT) AS sxy
      FROM ed
    )
    SELECT n, sx, sxx, sxy,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman, PRL 2002) of the word
    co-occurrence TYPE graph: the weighted Pearson correlation between
    the weighted degrees at the two ends of every edge — negative
    (disassortative) means hubs attach to low-degree words, the
    signature of natural-language co-occurrence graphs; a sign flip on
    a new corpus is a structural drift alarm the scalar degree
    histogram cannot raise. Computed with the agg_corr_regression
    discipline: five exact integer power sums (edge-weight-weighted),
    then ONE closed-form double expression — identical IEEE ops on
    identical integers on both engines, partition-stable at any
    parallelism (built-in corr() would fail the invariance sweep).
    The exact sums are output alongside r, so the oracle pins the
    integers, not just the derived double.

    The LSH candidate graph is NOT used here: its bucket cap makes
    every component near-regular (r degenerates to exactly 1.0), so
    the assortativity lives on the bigram graph — the vacuousness
    check that round-9 memory mandates for vocabulary-dependent ops.

    Scale shape: the corpus collapses to the type-level edge list in
    one partial-agg pass (the TextRank discipline — O(observed
    adjacencies), never O(tokens)); degrees are one more agg; the
    edge-degree join shuffles O(edge types); the final correlation is
    a 1-row aggregate. Nothing downstream of the first agg is
    token-proportional."""
    from pyspark_xgboost_spark.operators.text import _bigram_edges

    edges = _bigram_edges(load_table(spark, sf_dir, "documents"))
    edges = edges.localCheckpoint(eager=True)  # feeds deg + edge join
    deg = edges.groupBy("src").agg(F.sum("w").cast("bigint").alias("d"))
    ed = (
        edges.join(deg.withColumnRenamed("src", "k1"), F.col("src") == F.col("k1"))
        .withColumnRenamed("d", "x")
        .join(
            deg.withColumnRenamed("src", "k2").withColumnRenamed("d", "y"),
            F.col("dst") == F.col("k2"),
        )
        .select("w", "x", "y")
    )
    s = ed.agg(
        F.sum("w").cast("bigint").alias("n"),
        F.sum(F.col("w") * F.col("x")).cast("bigint").alias("sx"),
        F.sum(F.col("w") * F.col("y")).cast("bigint").alias("sy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("w") * F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    return s.select(
        "n",
        "sx",
        "sxx",
        "sxy",
        (cov_n / (F.sqrt(var_x) * F.sqrt(var_y))).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# Weighted local clustering coefficient (Onnela triangle intensities,
# degree-ordered closure over the word co-occurrence graph)
# --------------------------------------------------------------------------

_LCC_TOP = 200  # bounded output: top nodes by degree


@register(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_BIGRAM_EDGES_SQL},
    deg AS (
      SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      FROM wedges GROUP BY src
    ),
    wm AS (SELECT max(w) AS wm FROM wedges),
    oe AS (
      SELECT w.src AS u, w.dst AS v,
             CAST(round(ln(CAST(w.w AS DOUBLE) / wm.wm) * 1000000)
               AS BIGINT) AS lw
      FROM wedges w
      CROSS JOIN wm
      JOIN deg da ON da.node = w.src
      JOIN deg db ON db.node = w.dst
      WHERE da.deg < db.deg OR (da.deg = db.deg AND w.src < w.dst)
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c,
             CAST(round(exp((e1.lw + e2.lw + e3.lw) / 3000000.0)
                        * 1000000) AS BIGINT) AS t_micro
      FROM oe e1
      JOIN oe e2 ON e2.u = e1.v
      JOIN oe e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    pt AS (
      SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt,
             CAST(sum(t_micro) AS BIGINT) AS st FROM (
        SELECT a AS node, t_micro FROM tri
        UNION ALL SELECT b, t_micro FROM tri
        UNION ALL SELECT c, t_micro FROM tri
      ) corners
      GROUP BY node
    ),
    top AS (
      SELECT node, deg,
             row_number() OVER (ORDER BY deg DESC, node ASC) AS rk
      FROM deg WHERE deg >= 2
    )
    SELECT t.node AS word, t.deg, CAST(t.rk AS BIGINT) AS rk,
           CAST(COALESCE(p.tri_cnt, 0) AS BIGINT) AS tri_cnt,
           CAST((2 * COALESCE(p.st, 0)) // (t.deg * (t.deg - 1))
             AS BIGINT) AS cw_ppm
    FROM top t LEFT JOIN pt p ON p.node = t.node
    WHERE t.rk <= {_LCC_TOP}
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED LOCAL CLUSTERING COEFFICIENT (Onnela et al., PRE 71
    065103, 2005) per node of the word co-occurrence TYPE graph: the
    sum over triangles at v of the triangle INTENSITY — the geometric
    mean of its three max-normalized edge weights — over the wedge
    capacity deg(v)*(deg(v)-1)/2, for the top {_LCC_TOP} nodes by
    degree. The weighted form is the one that discriminates on a
    language graph: the unweighted coefficient saturates at 1.0 the
    moment the co-occurrence graph densifies (every frequent word's
    neighbors eventually co-occur at least once), while intensity
    keeps scoring HOW STRONGLY each neighborhood closes — function-
    word hubs close their wedges through rare incidental bigrams (low
    intensity), topical terms through repeated in-domain collocations
    (high intensity). A shift in the hub intensity profile between
    corpus snapshots is a structural drift alarm, the per-node
    companion to graph_degree_assortativity's single global r. The
    LSH candidate graph is deliberately NOT used: its bucket cap
    makes every component a near-clique of unit weights (the
    coefficient degenerates to exactly 1.0 — the vacuousness check
    round-9 memory mandates).

    Algorithm: DEGREE-ORDERED triangle closure (Ortmann-Brandes /
    forward algorithm) — orient every undirected edge from its
    (deg, word)-smaller endpoint to the larger; one wedge join + one
    closing-edge probe finds each triangle exactly once, carrying the
    three edge weights, credited to all three corners. Orientation is
    the load-bearing trick at scale: a stopword hub with degree D
    contributes wedges only via its OUT-edges, and out-degree under
    degree-ordering is O(sqrt(m)) amortized — worst-case wedge
    relation O(m^1.5), never O(D^2) on the hub.

    Determinism: edge log-weights quantize to integer micro-nats
    (ln(w/wmax) — the established lnu_micro idiom); each triangle's
    intensity exp(mean of three INTEGERS) is one identical IEEE
    expression on both engines, re-quantized to integer micro before
    the per-corner SUM, so the aggregate is exact-integer and
    partition-invariant; the final cw_ppm is pure integer division
    (2 * sum_intensity_micro) div (deg * (deg-1)).

    Scale shape: the corpus collapses to the type-level edge list in
    one partial-agg pass (the TextRank discipline — O(observed
    adjacencies), never O(tokens)); the weight normalizer is a 1-row
    broadcast; triangle closure shuffles the oriented edge list twice
    with the O(m^1.5) bound; output is capped to the top {_LCC_TOP}
    nodes by (deg DESC, word) — a total order, so both engines pick
    the identical set and the artifact stays bounded no matter how
    large the vocabulary grows."""
    from pyspark_xgboost_spark.operators.text import _bigram_edges

    edges = _bigram_edges(load_table(spark, sf_dir, "documents"))
    edges = edges.localCheckpoint(eager=True)  # feeds deg + orientation
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg")
    )
    wm = edges.agg(F.max("w").alias("wm"))
    da = deg.select(F.col("node").alias("u1"), F.col("deg").alias("du"))
    db = deg.select(F.col("node").alias("v1"), F.col("deg").alias("dv"))
    oe = (
        edges.crossJoin(F.broadcast(wm))
        .join(da, F.col("src") == F.col("u1"))
        .join(db, F.col("dst") == F.col("v1"))
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("src") < F.col("dst")))
        )
        .select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.round(
                F.log(F.col("w").cast("double") / F.col("wm")) * 1000000
            )
            .cast("bigint")
            .alias("lw"),
        )
    )
    oe = oe.localCheckpoint(eager=True)  # probed three times below
    e1 = oe.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("lw").alias("l1"))
    e2 = oe.select(F.col("u").alias("b2"), F.col("v").alias("c"), F.col("lw").alias("l2"))
    e3 = oe.select(F.col("u").alias("a3"), F.col("v").alias("c3"), F.col("lw").alias("l3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select(
            "a",
            "b",
            "c",
            F.round(
                F.exp((F.col("l1") + F.col("l2") + F.col("l3")) / 3000000.0)
                * 1000000
            )
            .cast("bigint")
            .alias("t_micro"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"), "t_micro")
        .union(tri.select(F.col("b").alias("node"), "t_micro"))
        .union(tri.select(F.col("c").alias("node"), "t_micro"))
    )
    pt = corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("tri_cnt"),
        F.sum("t_micro").cast("bigint").alias("st"),
    )
    top = (
        deg.filter(F.col("deg") >= 2)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("deg").desc(), F.col("node").asc())
            ),
        )
        .filter(F.col("rk") <= _LCC_TOP)
    )
    return top.join(pt, "node", "left").select(
        F.col("node").alias("word"),
        "deg",
        F.col("rk").cast("bigint").alias("rk"),
        F.coalesce(F.col("tri_cnt"), F.lit(0)).cast("bigint").alias("tri_cnt"),
        F.expr("(2 * coalesce(st, 0L)) div (deg * (deg - 1))")
        .cast("bigint")
        .alias("cw_ppm"),
    )


# --------------------------------------------------------------------------
# HyperANF: neighborhood-function estimation via HLL register merges
# --------------------------------------------------------------------------

_ANF_H = 3  # hop radius


def _anf_oracle() -> str:
    from pyspark_xgboost_spark.operators.sketches import (
        _HLL_ALPHA,
        _HLL_M,
        _HLL_RANKBITS,
        _hll_hex12_sql,
    )

    return f"""
    WITH RECURSIVE {_MINHASH_CAND_SQL},
    edges AS MATERIALIZED (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS n FROM edges),
    reach AS (
      SELECT n AS v, n AS u, 0 AS h FROM nodes
      UNION ALL
      SELECT r.v, e.dst AS u, r.h + 1
      FROM reach r JOIN edges e ON e.src = r.u
      WHERE r.h < {_ANF_H}
    ),
    rd AS (SELECT DISTINCT v, u FROM reach),
    hv AS (
      SELECT v AS g, CAST({_hll_hex12_sql('h')} AS BIGINT) AS hv
      FROM (SELECT v, md5(CAST(u AS VARCHAR)) AS h FROM rd) t
    ),
    rr AS (
      SELECT g, hv % {_HLL_M} AS reg,
             CASE WHEN hv // {_HLL_M} = 0 THEN {_HLL_RANKBITS}
                  ELSE {_HLL_RANKBITS} - length(bin(hv // {_HLL_M}))
             END AS rank
      FROM hv
    ),
    regs AS (
      SELECT g, reg, CAST(max(rank) AS BIGINT) AS m
      FROM rr GROUP BY g, reg
    ),
    grid AS (
      SELECT t.n AS g, gg.reg, COALESCE(regs.m, 0) AS m
      FROM nodes t
      CROSS JOIN (SELECT unnest(generate_series(0, {_HLL_M - 1})) AS reg) gg
      LEFT JOIN regs ON regs.g = t.n AND regs.reg = gg.reg
    ),
    est AS (
      SELECT g,
             sum(power(2.0, -m)) AS s,
             sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v,
             CAST(sum(m * (reg + 1)) AS BIGINT) AS reg_fp
      FROM grid GROUP BY g
    ),
    ex AS (
      SELECT v AS g, CAST(count(*) AS BIGINT) AS n_exact FROM rd GROUP BY v
    )
    SELECT e.g AS doc_id, ex.n_exact, e.reg_fp,
           CAST(e.v AS BIGINT) AS n_zero_regs,
           CAST(floor(CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                                <= {_HLL_M} * 5 / 2.0 AND e.v > 0
                           THEN {_HLL_M} * ln({_HLL_M} * 1.0 / e.v)
                           ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                      END * 1000) AS BIGINT) AS est_milli,
           CAST(CASE WHEN abs(CAST(floor(CASE WHEN {_HLL_ALPHA} * {_HLL_M}
                                   * {_HLL_M} / e.s <= {_HLL_M} * 5 / 2.0
                                   AND e.v > 0
                                THEN {_HLL_M} * ln({_HLL_M} * 1.0 / e.v)
                                ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / e.s
                           END * 1000) AS DOUBLE) / 1000 - ex.n_exact)
                     <= 0.195 * ex.n_exact
                THEN 1 ELSE 0 END AS INT) AS within_3sigma
    FROM est e JOIN ex ON ex.g = e.g
    """


@register("graph_hyperanf_reach", oracle=_anf_oracle())
def graph_hyperanf_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERANF (Boldi, Rosa & Vigna, WWW 2011): the {_ANF_H}-hop
    NEIGHBORHOOD FUNCTION of every node in the near-dup candidate
    graph, estimated by max-merging portable-HLL registers along
    edges — per iteration, each node's sketch absorbs its neighbors'
    sketches, so after h rounds node v's registers ARE the HLL of
    its <=h-hop reachable set. This is the graph-scale trick behind
    effective-diameter and reach-centrality numbers on graphs where
    exact per-node reachable SETS are quadratic poison: sketch state
    is O(nodes x m) forever, each round is ONE edge-list join + ONE
    max groupBy (the PageRank shuffle profile — no frontier set, no
    visited map), and the merge's associativity means per-shard
    sketches union freely across a 1000-executor graph. The exact
    referee (a {_ANF_H}-hop BFS reach count, feasible at test SF)
    rides along with the stream_hll-style 3-sigma gate, and because
    iterated max-merge over edges equals one HLL over the reachable
    set, the oracle never replays the iteration — it derives
    registers straight from the recursive reach relation (the same
    associativity argument that lets stream_hll_incremental assert
    bit-identity with the one-shot pass).

    Scale shape: registers initialize from one md5 projection of the
    node list; each of the {_ANF_H} rounds shuffles O(edges x m')
    register rows (m' = occupied registers, <= m) and map-side
    combines the max; the estimate is register-table-sized. The
    exact-reach referee is the one corpus-quadratic piece and exists
    ONLY as the test-SF attestation — the sketch path never
    materializes a reachable set."""
    from pyspark_xgboost_spark.operators.sketches import (
        hll_registers,
        hll_report,
    )

    edges = _lsh_edges(spark, sf_dir)  # memoized per session+corpus
    nodes = edges.select(F.col("src").alias("n")).distinct()
    regs = hll_registers(
        nodes.select(F.col("n").alias("g"), F.col("n").alias("id"))
    )
    for _ in range(_ANF_H):
        pulled = (
            edges.join(regs, F.col("dst") == F.col("g"))
            .select(F.col("src").alias("g"), "reg", "m")
        )
        regs = (
            regs.unionByName(pulled)
            .groupBy("g", "reg")
            .agg(F.max("m").alias("m"))
        )
    rep = hll_report(spark, regs, nodes.select(F.col("n").alias("g")))
    # exact referee: iterative frontier expansion (test-SF only)
    reach = nodes.select(F.col("n").alias("v"), F.col("n").alias("u"))
    for _ in range(_ANF_H):
        nxt = (
            reach.join(edges, F.col("u") == F.col("src"))
            .select("v", F.col("dst").alias("u"))
        )
        reach = reach.union(nxt).distinct()
    ex = reach.groupBy(F.col("v").alias("g")).agg(
        F.count("*").cast("bigint").alias("n_exact")
    )
    return rep.join(ex, "g").select(
        F.col("g").alias("doc_id"),
        "n_exact",
        "reg_fp",
        "n_zero_regs",
        "est_milli",
        F.when(
            F.abs(F.col("est_milli").cast("double") / 1000 - F.col("n_exact"))
            <= 0.195 * F.col("n_exact"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("within_3sigma"),
    )


# --------------------------------------------------------------------------
# Deterministic random walks (DeepWalk corpus generation)
# --------------------------------------------------------------------------

_RW_LEN = 5  # steps per walk (walk visits _RW_LEN + 1 nodes)


def _rw_step_sql(prev: str, out: str, t: int) -> str:
    """One unrolled walk step in DuckDB SQL: from each walk's current
    node, hop to the neighbor with the smallest md5(start:step:dst) —
    the derandomized uniform choice (same salt both engines)."""
    return f"""
    {out} AS (
      SELECT start, dst AS cur, path || '->' || dst AS path FROM (
        SELECT w.start, w.path, e.dst,
               row_number() OVER (
                 PARTITION BY w.start
                 ORDER BY md5(CAST(w.start AS VARCHAR) || ':{t}:'
                              || CAST(e.dst AS VARCHAR)), e.dst) AS rn
        FROM {prev} w JOIN edges e ON e.src = w.cur)
      WHERE rn = 1
    )"""


@register(
    "graph_random_walks",
    oracle="WITH "
    + _MINHASH_CAND_SQL
    + f""",
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    w0 AS (
      SELECT src AS start, src AS cur, CAST(src AS VARCHAR) AS path
      FROM (SELECT DISTINCT src FROM edges)
    ),
    {",".join(_rw_step_sql(f"w{t}", f"w{t + 1}", t + 1) for t in range(_RW_LEN))}
    SELECT start AS start_id, path AS walk,
           CAST(len(list_distinct(string_split(path, '->'))) AS BIGINT)
             AS n_unique_nodes
    FROM w{_RW_LEN}
    """,
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC RANDOM WALKS over the LSH candidate graph — the
    corpus-generation step of DeepWalk/node2vec (Perozzi et al., KDD
    2014): one {_RW_LEN}-step walk per node, whose node sequences
    become "sentences" for a skip-gram embedding trainer (the repo's
    PPMI co-occurrence operator is the matrix-factorization reading of
    the same corpus). The uniform next-hop draw is DERANDOMIZED the
    way every sampler here is (sample_hash_bucket discipline): hop to
    argmin_v md5(start:step:v) over the current node's neighbors —
    per-walk-independent, uniform over neighbors in aggregate,
    identically replayable in DuckDB (row_number over the same salt,
    dst tiebreak matching Spark's lexicographic (hash, dst) min).

    Spark shape: {_RW_LEN} unrolled join+agg stages — each step joins
    the walk frontier (one row per walk) to the edge list, shuffling
    O(walks x degree) candidate rows bounded by the LSH bucket cap,
    then min_by-reduces per walk; no driver interaction, no per-walk
    loop. At 100 TB with w walks per node this is the standard
    map-reduce DeepWalk recipe (frontier partitioned by current node,
    co-located with the edge list's src partitioning); plan depth is
    bounded by walk length, and longer walks localCheckpoint every k
    steps exactly like pagerank (graph.py:124).
    """
    edges = _lsh_edges(spark, sf_dir)
    cur = (
        edges.select("src")
        .distinct()
        .select(
            F.col("src").alias("start"),
            F.col("src").alias("cur"),
            F.col("src").cast("string").alias("path"),
        )
    )
    for t in range(1, _RW_LEN + 1):
        cand = cur.join(edges, cur["cur"] == edges["src"]).select(
            "start",
            "path",
            "dst",
            F.md5(
                F.concat(
                    F.col("start").cast("string"),
                    F.lit(f":{t}:"),
                    F.col("dst").cast("string"),
                )
            ).alias("h"),
        )
        cur = (
            cand.groupBy("start", "path")
            .agg(F.min(F.struct("h", "dst")).alias("m"))
            .select(
                "start",
                F.col("m.dst").alias("cur"),
                F.concat(
                    F.col("path"), F.lit("->"), F.col("m.dst").cast("string")
                ).alias("path"),
            )
        )
    return cur.select(
        F.col("start").alias("start_id"),
        F.col("path").alias("walk"),
        F.size(F.array_distinct(F.split(F.col("path"), "->")))
        .cast("bigint")
        .alias("n_unique_nodes"),
    )


# --------------------------------------------------------------------------
# Katz centrality (attenuated path counting — the degree-blind
# counterpart of PageRank)
# --------------------------------------------------------------------------

_KATZ_ROUNDS = 3
_KATZ_NUM, _KATZ_DEN = 1, 8  # attenuation alpha = 1/8 (< 1/max_degree)


def _katz_iter_sql(prev: str, out: str) -> str:
    """One unrolled Katz step in DuckDB integer units:
    k' = base + alpha * A k, floor-div exact."""
    return f"""
    {out} AS (
      SELECT n.doc_id,
             {_KATZ_SCALE} + COALESCE(s.contrib, 0) AS kz
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS doc_id,
               SUM(p.kz * {_KATZ_NUM} // {_KATZ_DEN}) AS contrib
        FROM edges e JOIN {prev} p ON e.src = p.doc_id
        GROUP BY e.dst
      ) s USING (doc_id)
    )"""


_KATZ_SCALE = 1_000_000_000


@register(
    "graph_katz_centrality",
    oracle="WITH "
    + _MINHASH_CAND_SQL
    + f""",
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM cand
      UNION ALL SELECT doc_b, doc_a FROM cand
    ),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    k0 AS (SELECT doc_id, CAST({_KATZ_SCALE} AS BIGINT) AS kz FROM nodes),
    {_katz_iter_sql("k0", "k1")},
    {_katz_iter_sql("k1", "k2")},
    {_katz_iter_sql("k2", "k3")}
    SELECT doc_id, CAST(kz AS BIGINT) AS katz_nano FROM k3
    """,
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KATZ CENTRALITY (Katz 1953) over the LSH candidate graph —
    attenuated path counting: k = sum_l alpha^l A^l 1, computed as
    {_KATZ_ROUNDS} unrolled k' = 1 + alpha.A.k steps in exact integer
    nano units with alpha = {_KATZ_NUM}/{_KATZ_DEN} (below 1/max
    degree, which the LSH bucket cap bounds, so the series
    contracts). The degree-BLIND counterpart of PageRank: PageRank
    divides each node's influence by its out-degree (a random
    surfer), Katz does not (an influence broadcast) — a boilerplate
    hub connected to many near-dup clusters scores high on Katz even
    when PageRank's degree normalization mutes it, which is exactly
    the "find the template spine of the corpus" question. Same
    deterministic discipline as graph_pagerank_fixed (graph.py:59):
    integer floor-div shares, BIGINT sums, bit-exact DuckDB replay.

    Scale shape: each round is one edges-to-scores hash join + one
    map-side-combined sum keyed by destination — O(edges) shuffle per
    round, plan depth bounded by the round count (localCheckpoint
    every k rounds is the >3-round recipe, as pagerank documents)."""
    edges = _lsh_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    kz = nodes.withColumn("kz", F.lit(_KATZ_SCALE).cast("long"))
    for _ in range(_KATZ_ROUNDS):
        contrib = (
            edges.join(kz, edges["src"] == kz["doc_id"])
            .select(
                "dst",
                F.expr(f"kz * {_KATZ_NUM} div {_KATZ_DEN}").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        kz = nodes.join(
            contrib, nodes["doc_id"] == contrib["dst"], "left"
        ).select(
            "doc_id",
            (
                F.lit(_KATZ_SCALE) + F.coalesce(F.col("contrib"), F.lit(0))
            )
            .cast("long")
            .alias("kz"),
        )
    return kz.select("doc_id", F.col("kz").cast("bigint").alias("katz_nano"))
