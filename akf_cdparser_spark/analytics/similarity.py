"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — expressed with ``F.aggregate`` /
``F.zip_with`` so the dot product runs JVM-side inside codegen (no Python).
Scale path: random-hyperplane LSH bucketing so each query probes only its
buckets — the broadcast side is the (tiny) query set, the big side streams.
At 100 TB the brute-force variant is still shuffle-free: queries broadcast,
one pass over the corpus, per-partition top-k then global top-k (Spark
does exactly this for window-rank over small k via partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk_bruteforce(embeddings: DataFrame, query_ids: list[int],
                           k: int = 5, round_to: int = 4) -> DataFrame:
    """For each query vector (selected by vec_id), the k nearest other
    vectors by cosine similarity. The query side is broadcast — Catalyst
    plans a broadcast nested-loop over a single corpus scan."""
    queries = (embeddings
               .filter(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb")))
    scored = (embeddings.join(F.broadcast(queries),
                              F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine",
                          F.round(_dot("q_emb", "embedding")
                                  / (_norm("q_emb") * _norm("embedding")),
                                  round_to)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def _hyperplane(dim: int, plane_id: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j of plane p is
    derived from a fixed integer mix (no RNG — reproducible everywhere)."""
    comps = []
    for j in range(dim):
        v = (plane_id * 1_000_003 + j * 7919 + 12345) % 2_000_000
        comps.append((v / 1_000_000.0) - 1.0)
    return comps


def lsh_bucket_keys(embeddings: DataFrame, dim: int, n_planes: int = 8) -> DataFrame:
    """Random-hyperplane sign signature -> one bucket key per vector."""
    sig = None
    for p in range(n_planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bit = F.when(_dot(F.col("embedding"), plane) >= 0, F.lit("1")).otherwise(F.lit("0"))
        sig = bit if sig is None else F.concat(sig, bit)
    return embeddings.select("vec_id", "embedding", sig.alias("bucket"))


def cosine_topk_lsh(embeddings: DataFrame, query_ids: list[int], dim: int,
                    k: int = 5, n_planes: int = 8, round_to: int = 4) -> DataFrame:
    """ANN via LSH: score only corpus vectors in the query's bucket. The
    bucket join is an equi-join (shuffle on an 8-char key) instead of a
    cross product; recall is traded for a ~2^planes candidate reduction."""
    keyed = lsh_bucket_keys(embeddings, dim, n_planes)
    queries = (keyed.filter(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"),
                       F.col("bucket")))
    scored = (keyed.join(F.broadcast(queries), "bucket")
              .filter(F.col("vec_id") != F.col("query_id"))
              .withColumn("cosine",
                          F.round(_dot("q_emb", "embedding")
                                  / (_norm("q_emb") * _norm("embedding")),
                                  round_to)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.97,
                        dim: int | None = None, n_planes: int = 6,
                        round_to: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs must share
    a sign bucket, then exact cosine filters at ``threshold``."""
    if dim is None:
        dim = len(embeddings.select("embedding").head()[0])
    keyed = lsh_bucket_keys(embeddings, dim, n_planes)
    pairs = (keyed.alias("a").join(keyed.alias("b"), "bucket")
             .filter(F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("vec_a"),
                     F.col("b.vec_id").alias("vec_b"),
                     F.col("a.embedding").alias("ea"),
                     F.col("b.embedding").alias("eb"))
             .distinct())
    return (pairs.withColumn(
                "cosine",
                F.round(_dot("ea", "eb") / (_norm("ea") * _norm("eb")), round_to))
            .filter(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine"))
