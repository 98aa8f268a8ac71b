"""Training-mix allocation: UniMax epoch-capped budget assignment.

UniMax (Chung et al. 2023, "UniMax: Fairer and More Effective Language
Sampling for Large-Scale Multilingual Pretraining") allocates a token
budget across sources by walking them smallest-first: each source gets
``min(cap * n_tokens, remaining_budget / remaining_sources)`` — small
sources are repeated up to the epoch cap, large sources split the rest
evenly. The sequential walk has a closed form this module computes
relationally: since ``cap * n_i`` is non-decreasing in the walk order,
there is a first rank ``m`` where the cap exceeds the equal share, all
ranks ``< m`` take their full cap, and all ranks ``>= m`` split the
remaining budget evenly. Everything is 64-bit integer arithmetic
(the threshold test ``cap*n_i*(k-i+1) > B - prefix_{i-1}`` avoids
division entirely; the equal share uses DIV with the remainder handed to
the lowest ranks), so a DuckDB twin value-hashes every allocation.

Scale shape: token counting is one map-side-combinable groupBy over the
corpus; everything after runs on the SOURCES table — cardinality = the
number of languages/domains in the mix (tens to thousands), so the
single-partition window over it is a deliberate, bounded choice, not a
scale hazard. The corpus itself is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def source_token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace-token totals per source — UniMax's input table."""
    return (docs.select(
        "source",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("_nt"))
        .groupBy("source").agg(F.sum("_nt").alias("n_tokens")))


def unimax_allocation(docs: DataFrame, budget: int | None = None,
                      epoch_cap: int = 3) -> DataFrame:
    """Per-source UniMax allocation over the corpus' whitespace-token
    counts. ``budget`` defaults to half the corpus total (computed in the
    plan, so the oracle derives the identical literal-free value).

    Output: (source, n_tokens, alloc_tokens, epochs_micro) where
    ``epochs_micro = alloc * 1e6 DIV n_tokens`` — the fixed-point epoch
    count a sampler would apply to that source."""
    counts = source_token_counts(docs)
    totals = counts.agg(F.count(F.lit(1)).alias("k"),
                        F.sum("n_tokens").alias("_total"))
    w = Window.orderBy("n_tokens", "source")
    ranked = (counts.join(F.broadcast(totals))
              .select("source", "n_tokens", "k",
                      (F.lit(budget) if budget is not None
                       else F.expr("_total div 2")).alias("b"),
                      F.row_number().over(w).alias("r"),
                      F.sum(F.col("n_tokens") * epoch_cap).over(
                          w.rowsBetween(Window.unboundedPreceding, 0))
                      .alias("_cum"))
              .withColumn("_prev", F.col("_cum")
                          - F.col("n_tokens") * epoch_cap)
              .withColumn("_cnt", F.col("k") - F.col("r") + 1)
              # cap*n_i > (B - prefix_{i-1}) / cnt_i, division-free
              .withColumn("_over", F.col("n_tokens") * epoch_cap
                          * F.col("_cnt") > F.col("b") - F.col("_prev")))
    # first rank where the cap exceeds the equal share; if none, every
    # source is capped (budget >= cap * total)
    mrow = (ranked.filter(F.col("_over"))
            .agg(F.min("r").alias("m"),
                 F.min_by("_prev", "r").alias("_prev_m"),
                 F.min_by("_cnt", "r").alias("_cnt_m")))
    # equal-share region: share = (B - prefix_{m-1}) DIV cnt_m with the
    # remainder's +1 going to the LAST ranks — exactly what the sequential
    # integer walk produces (iterated floor(remaining/remaining_count)
    # hands the extras to the tail; property-tested against the walk)
    alloc = (ranked.join(F.broadcast(mrow))
             .withColumn("_share", F.expr("(b - _prev_m) div _cnt_m"))
             .withColumn("_extra", F.expr("(b - _prev_m) % _cnt_m"))
             .withColumn(
                 "alloc_tokens",
                 F.when(F.col("m").isNull() | (F.col("r") < F.col("m")),
                        F.col("n_tokens") * epoch_cap)
                 .otherwise(F.col("_share")
                            + F.when(F.col("r") - F.col("m")
                                     >= F.col("_cnt_m") - F.col("_extra"),
                                     F.lit(1))
                            .otherwise(F.lit(0)))))
    return (alloc.select(
        "source", "n_tokens",
        F.col("alloc_tokens").cast("long").alias("alloc_tokens"),
        F.expr("(alloc_tokens * 1000000) div n_tokens")
        .cast("long").alias("epochs_micro")))
