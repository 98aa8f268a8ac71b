"""Token-budgeted shard packing — the step that assembles training shards:
lay the corpus out as one deterministic token stream and slice it into
fixed-capacity shards (the concatenate-then-slice packing GPT-style
pipelines use; a document whose stream span crosses a boundary is
assigned to the shard its FIRST token lands in).

Order is md5(key) — engine-portable and growth-stable like every identity
derivation in this repo. The running sum uses the same two-phase shape as
``crawl.frontier.global_sequence``: range-partition by the order key,
collect ONE tiny row per partition (the partition token totals), then an
order-preserving ``mapInPandas`` cumsum with the per-partition offset —
no single-partition window, no second shuffle, so the layout step scales
to any corpus the shuffle itself can sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import tokens_col


def pack_shards(docs: DataFrame, capacity: int,
                key: str = "doc_id") -> DataFrame:
    """docs(key, text) -> (key, n_tokens, start_offset, shard_id): each
    doc's position in the md5-ordered token stream and the shard
    (``start_offset DIV capacity``) its first token lands in.

    The result frame keeps the sorted input persisted; it is exposed as
    ``result._ordered_cache`` for the caller to unpersist after the
    consuming action (the ``global_sequence`` contract)."""
    spark = docs.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism // 2)
    ordered = (docs.select(
        F.col(key),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.md5(F.col(key).cast("string")).alias("_ord"))
        .repartitionByRange(n_parts, "_ord")
        .sortWithinPartitions("_ord")
        .withColumn("_pid", F.spark_partition_id())
        .persist())
    sums = {r["_pid"]: r["s"] for r in
            ordered.groupBy("_pid")
            .agg(F.sum("n_tokens").alias("s")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    key_field = next(f for f in docs.schema.fields if f.name == key)
    schema = T.StructType([
        key_field,
        T.StructField("n_tokens", T.LongType()),
        T.StructField("start_offset", T.LongType()),
        T.StructField("shard_id", T.LongType()),
    ])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        done, base = 0, None
        for pdf in batches:
            if not len(pdf):
                continue
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])]
            n = pdf["n_tokens"].to_numpy(dtype="int64")
            start = base + done + np.concatenate(([0], np.cumsum(n)[:-1]))
            out = pd.DataFrame({
                key: pdf[key].to_numpy(),
                "n_tokens": n,
                "start_offset": start,
                "shard_id": start // capacity,
            })
            done += int(n.sum())
            yield out

    result = ordered.mapInPandas(assign, schema)
    result._ordered_cache = ordered
    return result
