"""Link-graph analytics for crawl prioritization.

PageRank here is FIXED-POINT: scores are BIGINT micro-units and every
step is integer arithmetic (``DIV``, ``*``, order-independent integer
sums), so the result is bit-identical across engines, partitionings and
parallelism levels — the property that lets an ITERATIVE graph algorithm
sit behind a value-hashed DuckDB oracle, where float PageRank could not
(distributed float summation is order-sensitive and round-to-6 does not
rescue ties). The price is floor-division mass leakage per step, which is
deterministic and harmless for the use case: ranking hosts/pages for
crawl scheduling needs a stable order, not the eigenvector's 15th digit.

Scale shape: each iteration is one equi-join (edges x scores on src,
shuffle keyed by src/dst with map-side combine on the contribution sum)
plus a broadcast-size node frame; out-degrees are computed once. k
iterations = k shuffles — the standard Pregel-shaped plan, no driver-side
state beyond the loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixedpoint(spark: SparkSession, edges: DataFrame,
                        n_nodes: int, n_iter: int = 3,
                        damping_pct: int = 85,
                        scale: int = PR_SCALE) -> DataFrame:
    """edges(src, dst) over nodes 0..n_nodes-1 -> (node, score) after
    ``n_iter`` synchronous steps:

        score_0   = scale DIV n_nodes                     (every node)
        contrib   = score_t DIV out_degree(src)           (per edge)
        score_t+1 = ((100-damping_pct) * (scale DIV n_nodes)) DIV 100
                    + (damping_pct * sum(contrib into node)) DIV 100

    Parallel edges are counted once each (multigraph semantics); nodes
    without in-links keep only the teleport term; mass lost to floor
    division and dangling nodes is NOT redistributed (deterministic
    leakage, documented above)."""
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    base = scale // n_nodes
    teleport = ((100 - damping_pct) * base) // 100
    scores = nodes.withColumn("score", F.lit(base).cast("long"))
    ew = edges.join(outdeg, "src")
    for _ in range(n_iter):
        contribs = (ew.join(scores, ew.src == scores.node)
                    .select(F.col("dst").alias("node"),
                            F.expr("score div _deg").alias("_c"))
                    .groupBy("node").agg(F.sum("_c").alias("_in")))
        scores = (nodes.join(contribs, "node", "left")
                  .select(
                      "node",
                      (F.lit(teleport).cast("long")
                       + F.expr(f"({damping_pct} * coalesce(_in, 0L))"
                                " div 100"))
                      .alias("score")))
    return scores


def pagerank_weighted(spark: SparkSession, edges: DataFrame,
                      n_nodes: int, n_iter: int = 3,
                      damping_pct: int = 85,
                      scale: int = PR_SCALE) -> DataFrame:
    """Weighted fixed-point PageRank: ``edges(src, dst, weight)`` with
    integer weights — the HOST-graph variant, where an edge's weight is
    how many page-level links the (src_host, dst_host) pair aggregates
    (crawl prioritization ranks hosts, not pages, at 10^10 scale; the
    host graph is the page graph collapsed by a groupBy, orders of
    magnitude smaller).

    Per edge: ``contrib = (score_t * weight) DIV total_out_weight(src)``
    — all-integer, order-independent sums, so the same bit-exactness
    contract as ``pagerank_fixedpoint`` holds (value-hashed oracle, any
    parallelism). ``score * weight`` stays < 2^63 for scale 10^12 and
    weights < ~9e6 per src; callers with heavier hosts scale weights
    down first (documented bound, not checked per row)."""
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    outw = edges.groupBy("src").agg(F.sum("weight").alias("_w"))
    base = scale // n_nodes
    teleport = ((100 - damping_pct) * base) // 100
    scores = nodes.withColumn("score", F.lit(base).cast("long"))
    ew = edges.join(outw, "src")
    for _ in range(n_iter):
        contribs = (ew.join(scores, ew.src == scores.node)
                    .select(F.col("dst").alias("node"),
                            F.expr("(score * weight) div _w").alias("_c"))
                    .groupBy("node").agg(F.sum("_c").alias("_in")))
        scores = (nodes.join(contribs, "node", "left")
                  .select(
                      "node",
                      (F.lit(teleport).cast("long")
                       + F.expr(f"({damping_pct} * coalesce(_in, 0L))"
                                " div 100"))
                      .alias("score")))
    return scores
