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
    """Deterministic pseudo-random hyperplane: component j of plane p comes
    from an md5 mix (no RNG state — reproducible everywhere). A plain
    linear-congruential ramp is NOT good enough here: consecutive planes
    end up correlated and every LSH band induces the same partition."""
    import hashlib

    comps = []
    for j in range(dim):
        h = hashlib.md5(f"{plane_id}:{j}".encode()).hexdigest()
        comps.append((int(h[:8], 16) / float(0x7FFFFFFF)) - 1.0)
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


def lsh_banded_bucket_keys(embeddings: DataFrame, dim: int, n_bands: int = 4,
                           planes_per_band: int = 4) -> DataFrame:
    """OR-AND LSH: ``n_bands`` independent sign signatures per vector, one
    row per (vec, band). Candidates = any shared (band, bucket) — the same
    banding trick as MinHash LSH, tunable recall at equi-join cost."""
    bands = []
    for b in range(n_bands):
        sig = None
        for p in range(planes_per_band):
            plane = F.array(*[F.lit(c) for c in
                              _hyperplane(dim, b * planes_per_band + p)])
            bit = (F.when(_dot(F.col("embedding"), plane) >= 0, F.lit("1"))
                   .otherwise(F.lit("0")))
            sig = bit if sig is None else F.concat(sig, bit)
        bands.append(F.struct(F.lit(b).alias("band"), sig.alias("bucket")))
    return (embeddings
            .select("vec_id", "embedding",
                    F.explode(F.array(*bands)).alias("bb"))
            .select("vec_id", "embedding", F.col("bb.band").alias("band"),
                    F.col("bb.bucket").alias("bucket")))


def cosine_topk_lsh_banded(embeddings: DataFrame, query_ids: list[int],
                           dim: int, k: int = 5, n_bands: int = 4,
                           planes_per_band: int = 4,
                           round_to: int = 4) -> DataFrame:
    """ANN with banded LSH: candidates share at least one band bucket with
    the query; exact cosine ranks the candidates. Equi-join on
    (band, bucket) — never a cross product."""
    keyed = lsh_banded_bucket_keys(embeddings, dim, n_bands, planes_per_band)
    queries = (keyed.filter(F.col("vec_id").isin(query_ids))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_emb"), "band", "bucket"))
    cands = (keyed.join(F.broadcast(queries), ["band", "bucket"])
             .filter(F.col("vec_id") != F.col("query_id"))
             .select("query_id", "q_emb", "vec_id", "embedding")
             .dropDuplicates(["query_id", "vec_id"]))
    scored = cands.withColumn(
        "cosine", F.round(_dot("q_emb", "embedding")
                          / (_norm("q_emb") * _norm("embedding")), round_to))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id", "cosine", "rank"))


def ann_recall_vs_bruteforce(embeddings: DataFrame, query_ids: list[int],
                             k: int = 5, n_bands: int = 8,
                             planes_per_band: int = 3,
                             dim: int = 64) -> DataFrame:
    """Continuous gate for the ANN scale path: per-query recall@k of the
    banded-LSH top-k against the brute-force oracle. ``dim`` is a plan-time
    constant (pass it from config; no driver action inside the operator)."""
    brute = (cosine_topk_bruteforce(embeddings, query_ids, k)
             .select("query_id", "vec_id"))
    ann = (cosine_topk_lsh_banded(embeddings, query_ids, dim, k,
                                  n_bands, planes_per_band)
           .select("query_id", F.col("vec_id").alias("ann_vec_id")))
    hits = brute.join(ann, (brute.query_id == ann.query_id)
                      & (brute.vec_id == ann.ann_vec_id), "left_semi")
    return (brute.groupBy("query_id").agg(F.count("*").alias("n_true"))
            .join(hits.groupBy("query_id").agg(F.count("*").alias("n_hit")),
                  "query_id", "left")
            .select("query_id",
                    F.round(F.coalesce(F.col("n_hit"), F.lit(0))
                            / F.col("n_true"), 4).alias("recall")))


def embedding_near_dups(embeddings: DataFrame, *, dim: int,
                        threshold: float = 0.97, n_planes: int = 6,
                        round_to: int = 4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: pairs must share
    a sign bucket, then exact cosine filters at ``threshold``. ``dim`` is a
    REQUIRED plan-time constant (no driver action inside the operator; a
    silent default would truncate the hyperplanes for wider embeddings and
    lose recall — pass the real dimension from config/schema)."""
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
