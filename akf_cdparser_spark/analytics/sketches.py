"""Cardinality sketches for 100-TB profiling.

KMV (k-minimum-values, Bar-Yossef et al. 2002) rather than HLL on
purpose: Spark's approx_count_distinct and DuckDB's approx_count_distinct
are DIFFERENT HLL implementations whose estimates can never value-match,
while KMV over an md5-derived hash is engine-portable — the k smallest
hashes, hence the estimate itself, are bit-identical everywhere. That
turns an APPROXIMATE operator into an exactly-testable one (the same
move as the md5 MinHash/shard derivations elsewhere in this repo).

Scale shape: per column, one distinct-hash pass (shuffle carries only a
long) followed by a global top-k — Spark executes orderBy().limit(k) as
TakeOrderedAndProject (per-partition heaps + a k-row driver merge), never
a full sort. The estimate is one row; k rows cross the cluster boundary.

Determinism of the float step: kth is < 2^60 (15 hex digits of md5) and
(k-1)*2^60 is exactly representable (8 significant bits scaled by a power
of two); long->double conversion and IEEE division round identically in
the JVM and DuckDB, and the final floor() is rounding-mode-free — so even
the floating division is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KMV_HASH_SPACE = 2**60  # conv(substr(md5, 1, 15), 16, 10): 15 hex digits


def _kmv_hashes(df: DataFrame, col: str) -> DataFrame:
    # NULLs excluded: md5(NULL) is a NULL hv that sorts first (NULLS
    # FIRST) and would displace a real hash from the k-sample (ADVICE r5)
    return (df.filter(F.col(col).isNotNull()).select(
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
               16, 10).cast("long").alias("hv"))
        .distinct())


def kmv_set_ops(df_a: DataFrame, col_a: str,
                df_b: DataFrame, col_b: str, k: int = 256) -> DataFrame:
    """KMV set-operation estimates (Beyer et al. 2007): one row with
    ``(n_union_sample, kth_hash, est_union, n_both, est_jaccard,
    est_intersection)`` for the value sets A = df_a[col_a], B =
    df_b[col_b].

    Method: merge the distinct hash sets, take the k smallest (the KMV
    sketch of A ∪ B — sketches compose by union, which is what makes
    them maintainable incrementally at 100 TB), estimate |A ∪ B| from the
    k-th hash, estimate Jaccard as the fraction of the union sample
    present in BOTH sets, and intersect by product. Every step is integer
    or exactly-representable double arithmetic — the estimates value-match
    any engine, like ``kmv_distinct``. Exhaustive branch: fewer than k
    union hashes -> exact union, exact membership, exact intersection."""
    ha = _kmv_hashes(df_a, col_a)
    hb = _kmv_hashes(df_b, col_b)
    merged = (ha.withColumn("in_a", F.lit(1)).withColumn("in_b", F.lit(0))
              .unionByName(
                  hb.withColumn("in_a", F.lit(0)).withColumn("in_b", F.lit(1)))
              .groupBy("hv")
              .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    sample = merged.orderBy("hv").limit(k)
    agg = sample.agg(
        F.count("*").alias("n_union_sample"),
        F.max("hv").alias("_kth"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_both"))
    est_union = F.when(
        F.col("n_union_sample") < k, F.col("n_union_sample").cast("long")
    ).otherwise(
        F.floor(F.lit(float((k - 1) * KMV_HASH_SPACE))
                / F.col("_kth").cast("double")).cast("long"))
    return agg.select(
        "n_union_sample",
        F.when(F.col("n_union_sample") >= k, F.col("_kth")).alias("kth_hash"),
        est_union.alias("est_union"),
        "n_both",
        F.round(F.col("n_both").cast("double")
                / F.col("n_union_sample"), 6).alias("est_jaccard"),
        F.floor((F.col("n_both").cast("double")
                 / F.col("n_union_sample"))
                * est_union.cast("double")).cast("long")
        .alias("est_intersection"))


CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_token_counts(docs: DataFrame, top_n: int = 15,
                     depth: int = CMS_DEPTH,
                     width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch (Cormode/Muthukrishnan) over whitespace tokens,
    queried for the corpus's ``top_n`` exact-frequency tokens: one row per
    token with ``(token, exact_n, cms_est)``. The row hashes are
    md5-derived (``md5(r || '|' || token)``), so the sketch — and the
    over-estimate it returns — is bit-identical in any engine; ``cms_est
    >= exact_n`` always (the CMS invariant, gated by the oracle hash).

    Scale shape: the sketch build is ONE explode + ONE groupBy over at
    most depth*width cells (map-side combine collapses per-partition
    counts first — the shuffle carries <= depth*width rows per partition
    regardless of corpus size); the query side is a broadcast join of the
    candidate tokens against the tiny cell table. This is the shape that
    lets a 100-TB corpus maintain frequency estimates without a
    full-cardinality groupBy."""
    from .text import tokens_col

    toks = docs.select(F.explode(tokens_col()).alias("token"))
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r")
    cells = (toks.select("token", rows)
             .select("r",
                     (F.conv(F.substring(
                         F.md5(F.concat_ws("|", F.col("r").cast("string"),
                                           "token")), 1, 15), 16, 10)
                      .cast("long") % width).alias("bucket"))
             .groupBy("r", "bucket").agg(F.count("*").alias("n")))
    top = (toks.groupBy("token").agg(F.count("*").alias("exact_n"))
           .orderBy(F.desc("exact_n"), F.desc("token")).limit(top_n))
    probes = top.select(
        "token", "exact_n",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"))
    probes = probes.withColumn(
        "bucket",
        F.conv(F.substring(
            F.md5(F.concat_ws("|", F.col("r").cast("string"), "token")),
            1, 15), 16, 10).cast("long") % width)
    return (probes.join(F.broadcast(cells), ["r", "bucket"])
            .groupBy("token", "exact_n")
            .agg(F.min("n").alias("cms_est")))


def profile_table(df: DataFrame, cols: list[str], k: int = 256) -> DataFrame:
    """ANALYZE-style column profile: one row per column with
    ``(column, n_rows, n_nulls, min_value, max_value, est_distinct)`` —
    min/max rendered as strings for a uniform schema, distinct counts via
    the portable KMV sketch (exact below k). The statistics a planner or
    a data-quality gate reads before touching 100 TB. The base stats for
    EVERY column come from ONE aggregation pass (per-column min/max/null
    counters of a single agg row, exploded back to rows) — the previous
    shape scanned the table once per column; only the KMV sketches still
    need their per-column distinct top-k. Rows-to-driver stays bounded
    by k."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs += [F.sum(F.col(c).isNull().cast("long")).alias(f"_nn{i}"),
                 F.min(c).cast("string").alias(f"_mn{i}"),
                 F.max(c).cast("string").alias(f"_mx{i}")]
    entries = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(f"_nn{i}").alias("n_nulls"),
                 F.col(f"_mn{i}").alias("min_value"),
                 F.col(f"_mx{i}").alias("max_value"))
        for i, c in enumerate(cols)])
    base = (df.agg(*aggs)
            .select("n_rows", F.explode(entries).alias("e"))
            .select("e.column", "n_rows", "e.n_nulls",
                    "e.min_value", "e.max_value"))
    est = kmv_distinct(df, cols, k).select("column", "est_distinct")
    return base.join(est, "column")


def kmv_distinct(df: DataFrame, cols: list[str], k: int = 256) -> DataFrame:
    """One row per column: ``(column, n_kept, kth_hash, est_distinct)``.

    Estimator: with h_k the k-th smallest distinct hash in [0, 2^60),
    est = floor((k-1) * 2^60 / h_k); when fewer than k distinct hashes
    exist the sketch is exhaustive and est is the exact count (h_k is
    NULL in that branch). Standard error ~ 1/sqrt(k-2). NULL column
    values are excluded (md5(NULL) is a NULL hv that would sort first
    under NULLS FIRST and inflate the sample by one; ADVICE r5)."""
    out = None
    for c in cols:
        hashes = (df.filter(F.col(c).isNotNull())
            .select(
            F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 15),
                   16, 10).cast("long").alias("hv"))
            .distinct())
        topk = hashes.orderBy("hv").limit(k)
        row = (topk.agg(F.count("*").alias("n_kept"),
                        F.max("hv").alias("_kth"))
               .select(
                   F.lit(c).alias("column"),
                   "n_kept",
                   F.when(F.col("n_kept") >= k, F.col("_kth"))
                   .alias("kth_hash"),
                   F.when(F.col("n_kept") < k,
                          F.col("n_kept").cast("long"))
                   .otherwise(
                       F.floor(F.lit(float((k - 1) * KMV_HASH_SPACE))
                               / F.col("_kth").cast("double"))
                       .cast("long"))
                   .alias("est_distinct")))
        out = row if out is None else out.unionByName(row)
    return out
