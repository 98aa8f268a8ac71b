"""Fixed-point k-means over int8-quantized embeddings — document
clustering for curation (topic balancing, per-cluster sampling, coverage
audits) that is DETERMINISTIC enough to sit behind a value-hashed oracle.

Float Lloyd iterations are partition-order-nondeterministic (float sums)
and engine-divergent; this variant stays in integers end-to-end:

* vectors are the int8 codes of ``similarity._quantize_arrays`` (floor
  quantization — engine-stable, q89);
* distances are integer squared-L2 over the codes (exact in any engine);
* assignment ties break to the smallest cluster id via lexicographic
  ``array_min`` over (dist, cid) structs;
* centroid updates are floor(sum / count) per dimension — floor of an
  exact double ratio (|sum| < 2^53), identical to Python's ``//`` for the
  positive-and-negative integer sums involved;
* initialization is the deterministic md5-rank sample (the IVF coarse
  quantizer's trick): the k vectors ranked first by (md5(vec_id), vec_id).

The result is a pure function of the corpus — partitioning-invariant,
bit-identical across engines, pinned against a numpy twin
(scripts/gen_pinned_oracles.q96_rows).

Scale shape: per iteration, assignment is a broadcast one-row join (the
centroid table collapses to k x dim integers) + higher-order functions —
no shuffle of the corpus; the update is ONE groupBy over (cluster, dim)
rows (k x dim groups). Driver traffic is k x dim ints per iteration —
bounded by the model size, never the data (the BPE argmax / dup-cluster
convergence-read contract). Empty clusters keep their previous centroid.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _quantize_arrays


def _assign(codes: DataFrame, cents: list[tuple[int, list[int]]]
            ) -> DataFrame:
    """Tag each vector with its nearest centroid: (vec_id, q, cluster_id,
    dist). ``cents`` is the driver-side model (k x dim ints)."""
    spark = codes.sparkSession
    cents_row = spark.createDataFrame(
        [(cents,)], "cents: array<struct<cid: int, c: array<int>>>")
    scored = F.transform(
        "cents",
        lambda s: F.struct(
            F.aggregate(
                F.zip_with("q", s["c"],
                           lambda a, b: ((a - b) * (a - b)).cast("long")),
                F.lit(0).cast("long"), lambda acc, x: acc + x).alias("dist"),
            s["cid"].alias("cid")))
    return (codes.join(F.broadcast(cents_row))
            .withColumn("_best", F.array_min(scored))
            .select("vec_id", "q",
                    F.col("_best.cid").alias("cluster_id"),
                    F.col("_best.dist").alias("dist")))


def kmeans_int8(embeddings: DataFrame, k: int = 8,
                n_iter: int = 3, keep_codes: bool = False) -> DataFrame:
    """Cluster ``embeddings(vec_id, embedding)`` into ``k`` groups with
    ``n_iter`` fixed-point Lloyd steps over the int8 codes; returns
    ``(vec_id, cluster_id, dist)`` under the final centroids —
    plus the checkpointed ``q`` codes when ``keep_codes`` (consumers like
    semdedup reuse them instead of re-scanning + re-joining the corpus)."""
    codes = _quantize_arrays(embeddings).localCheckpoint()
    init = (codes
            .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
            .limit(k).collect())
    cents = [(cid, list(r.q)) for cid, r in enumerate(init)]
    dim = len(cents[0][1]) if cents else 0
    for _ in range(n_iter):
        assigned = _assign(codes, cents)
        sums = (assigned
                .select("cluster_id", F.posexplode("q").alias("dim", "v"))
                .groupBy("cluster_id", "dim")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect())
        by_cid: dict[int, list[int]] = {}
        for r in sums:
            by_cid.setdefault(r.cluster_id, [0] * dim)[r.dim] = \
                int(r.s) // int(r.n)
        cents = [(cid, by_cid.get(cid, c)) for cid, c in cents]
    final = _assign(codes, cents)
    if keep_codes:
        return final.select("vec_id", "q", "cluster_id", "dist")
    return final.select("vec_id", "cluster_id", "dist")


def semdedup(embeddings: DataFrame, k: int | None = None, n_iter: int = 3,
             threshold: float = 0.4, round_to: int = 4,
             max_cluster_size: int | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embeddings,
    then inside each cluster drop near-semantic-duplicates — for every
    pair with cosine >= ``threshold``, the member FARTHER from the
    centroid survives (the paper's keep-low-centroid-similarity rule:
    retain the most diverse representative). Clustering is the
    fixed-point int8 k-means (q96) and cosines are the int8 4-dp scan
    (q90), so the whole verdict is engine-exact: a vector is removed iff
    some same-cluster neighbor has cosine >= threshold AND strictly wins
    the (dist DESC, vec_id ASC) keeper order.

    Returns (vec_id, cluster_id, dist, is_kept) for every vector.

    Scale shape: the pair scan is an equi-join on cluster_id over each
    UNORDERED pair once (a.vec_id < b.vec_id; the cosine is symmetric and
    the keeper order is a strict total order, so one evaluation decides
    the pair) — pairwise work bounded per cluster, which is exactly
    SemDeDup's own trade (the paper, §3, runs k ~ sqrt(N) clusters so
    within-cluster pair counts stay ~N^1.5 total); the removal rule is
    per-pair local (no connected components, no sequential sweep), one
    join back. The int8 codes ride along from the clustering pass
    (keep_codes) — no second corpus scan, no corpus-wide re-join.

    Quadratic-collapse guards (both derived from one O(1)-driver count
    when left at their ``None`` defaults):

    * ``k=None`` -> ceil(sqrt(N)), the paper's own sizing — a caller who
      forgets k can no longer point k=8 at a 10^9-doc corpus (~10^17
      pairs);
    * ``max_cluster_size=None`` -> max(1024, 4*ceil(sqrt(N))): clusters
      the k-means leaves larger than the bound (skewed corpora, centroid
      collapse on near-identical embeddings) are SPLIT into
      ceil(size/bound) deterministic md5(vec_id) subcells before the
      pair join, so no input distribution can go quadratic. The trade:
      pairs straddling two subcells of an OVERSIZED cluster are not
      compared — bounded-recall sampling of exactly the pathological
      surface, mirroring the paper's own per-cluster cap. Clusters
      within bound take the identical single-key path (the pinned q105
      oracle is byte-unchanged when no cluster exceeds the bound)."""
    if k is None or max_cluster_size is None:
        n = embeddings.count()
    if k is None:
        k = max(1, math.ceil(math.sqrt(n)))
    if max_cluster_size is None:
        max_cluster_size = max(1024, 4 * math.ceil(math.sqrt(n)))
    with_codes = kmeans_int8(embeddings, k=k, n_iter=n_iter,
                             keep_codes=True)
    oversized = (with_codes.groupBy("cluster_id")
                 .agg(F.count(F.lit(1)).alias("_n"))
                 .filter(F.col("_n") > max_cluster_size)
                 .collect())  # <= k rows
    if oversized:
        spark = embeddings.sparkSession
        split_df = spark.createDataFrame(
            [(int(r.cluster_id),
              math.ceil(int(r._n) / max_cluster_size)) for r in oversized],
            "cluster_id int, _splits int")
        sub = F.pmod(
            F.conv(F.substring(F.md5(F.col("vec_id").cast("string")),
                               1, 15), 16, 10).cast("long"),
            F.coalesce(F.col("_splits"), F.lit(1)))
        x = (with_codes.join(F.broadcast(split_df), "cluster_id", "left")
             .withColumn("_cell",
                         F.concat_ws("#", F.col("cluster_id"), sub))
             .drop("_splits"))
    else:
        x = with_codes.withColumn(
            "_cell", F.col("cluster_id").cast("string"))
    a, b = x.alias("a"), x.alias("b")
    cos = F.round(
        F.aggregate(F.zip_with(F.col("a.q"), F.col("b.q"),
                               lambda p, q: (p * q).cast("long")),
                    F.lit(0).cast("long"), lambda acc, v: acc + v)
        / (F.sqrt(F.aggregate(F.transform(
            F.col("a.q"), lambda p: (p * p).cast("long")),
            F.lit(0).cast("long"), lambda acc, v: acc + v))
           * F.sqrt(F.aggregate(F.transform(
               F.col("b.q"), lambda p: (p * p).cast("long")),
               F.lit(0).cast("long"), lambda acc, v: acc + v))),
        round_to)
    # each unordered pair once; the keeper-order LOSER is removed
    b_beats_a = ((F.col("b.dist") > F.col("a.dist"))
                 | ((F.col("b.dist") == F.col("a.dist"))
                    & (F.col("b.vec_id") < F.col("a.vec_id"))))
    removed = (a.join(b, (F.col("a._cell") == F.col("b._cell"))
                      & (F.col("a.vec_id") < F.col("b.vec_id")))
               .filter(cos >= threshold)
               .select(F.when(b_beats_a, F.col("a.vec_id"))
                       .otherwise(F.col("b.vec_id")).alias("vec_id"))
               .distinct()
               .withColumn("_rm", F.lit(True)))
    return (with_codes.join(removed, "vec_id", "left")
            .select("vec_id", "cluster_id", "dist",
                    F.coalesce(~F.col("_rm"), F.lit(True)).alias("is_kept")))
