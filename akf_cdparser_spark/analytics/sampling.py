"""Deterministic sampling operators.

Random sampling is useless under a value-hashed oracle (and irreproducible
across reruns of a 100-TB job after a partial failure); every sampler here
orders by an md5-derived rank instead — a fixed pseudo-random permutation
of the key space that any engine reproduces bit-for-bit. (Unlike the
threshold-based ``hash_split`` (q82), a fixed-k sample is NOT stable under
corpus growth — a new row with a smaller hash displaces the k-th; use
hash_split when growth stability matters more than an exact count.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, strata: list[str], k: int,
                      id_col: str = "doc_id") -> DataFrame:
    """The k rows of each stratum with the smallest md5(id) — a
    deterministic per-stratum sample (eval holdouts per language/source,
    inspection panels, labeling batches). Ties on the full 32-hex digest
    require md5 collisions, so the rank order is total in practice; the
    id itself breaks the tie exactly if one ever occurs.

    Scale: one window over (strata) — for mega-strata the same two-phase
    salted top-k the politeness scheduler uses (frontier._schedule_tagged)
    applies verbatim; at sample sizes this small the single window is the
    right plan (partial ranks prune nothing until k approaches the
    stratum size)."""
    rank_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata).orderBy(rank_key.asc(),
                                            F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .withColumn("sample_rank", F.col("_rk").cast("int"))
            .drop("_rk"))
