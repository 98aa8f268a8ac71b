"""Partitioned bloom-filter URL-seen set with cuckoo spill for hot shards.

Role (north rule + SURVEY.md §7.2): the bloom/cuckoo shards are a THROUGHPUT
PREFILTER over the exact Iceberg/parquet seen table — a candidate URL whose
shard says "definitely unseen" skips the expensive anti-join; a "maybe seen"
candidate is resolved EXACTLY against the seen table. False positives can
therefore never drop a URL, and the final seen set is exact by construction.

Layout: ``n_shards`` shards keyed by ``url_hash64 % n_shards``; each shard is
a numpy bit array built distributively with ``applyInPandas`` (one group per
shard) and persisted as a binary row (shard_id, bits, n_items, kind). A shard
whose fill ratio exceeds the churn threshold is rebuilt as a cuckoo filter
(supports deletion for recrawl invalidation; bucketed 4-way, 16-bit
fingerprints).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHARD_SCHEMA = T.StructType([
    T.StructField("shard_id", T.IntegerType()),
    T.StructField("bits", T.BinaryType()),
    T.StructField("n_items", T.LongType()),
    T.StructField("kind", T.StringType()),      # 'bloom' | 'cuckoo'
])

BLOOM_BITS_PER_ITEM = 12     # ~0.3% fp at k=4
BLOOM_K = 4
CUCKOO_BUCKETS_POW = 12      # 4096 buckets x 4 slots x uint16
CHURN_FILL_THRESHOLD = 0.35  # bloom fill ratio that triggers cuckoo spill


def _bloom_positions(h: np.ndarray, m: int) -> list[np.ndarray]:
    """k derived probe positions from one 60-bit hash (double hashing)."""
    h1 = h % m
    h2 = (h >> 17 | 1) % m
    return [(h1 + i * h2) % m for i in range(BLOOM_K)]


def _build_bloom(hashes: np.ndarray, m_bits: int) -> bytes:
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    for pos in _bloom_positions(hashes.astype(np.uint64), m_bits):
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return bits.tobytes()


def _bloom_contains(bits: np.ndarray, hashes: np.ndarray, m_bits: int) -> np.ndarray:
    out = np.ones(len(hashes), dtype=bool)
    for pos in _bloom_positions(hashes.astype(np.uint64), m_bits):
        out &= (bits[pos // 8] >> (pos % 8) & 1).astype(bool)
    return out


def _cuckoo_fingerprint(h: np.ndarray) -> np.ndarray:
    fp = ((h >> 40) & 0xFFFF).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _build_cuckoo(hashes: np.ndarray) -> bytes:
    n_buckets = 1 << CUCKOO_BUCKETS_POW
    table = np.zeros((n_buckets, 4), dtype=np.uint16)
    h = hashes.astype(np.uint64)
    fps = _cuckoo_fingerprint(h)
    b1s = (h % n_buckets).astype(np.int64)
    for fp, b1 in zip(fps, b1s):
        b = int(b1)
        placed = False
        for _kick in range(64):
            row = table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                placed = True
                break
            # evict slot 0, move on (partial cuckoo walk, deterministic)
            fp, row[0] = row[0], fp
            b = int((b ^ (int(fp) * 0x5BD1E995)) % n_buckets)
        if not placed:  # extremely unlikely at our shard sizes
            table[b][0] = fp
    return table.tobytes()


def _cuckoo_contains(table: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    n_buckets = table.shape[0]
    h = hashes.astype(np.uint64)
    fps = _cuckoo_fingerprint(h)
    b1 = (h % n_buckets).astype(np.int64)
    b2 = ((b1 ^ (fps.astype(np.int64) * 0x5BD1E995)) % n_buckets).astype(np.int64)
    in1 = (table[b1] == fps[:, None]).any(axis=1)
    in2 = (table[b2] == fps[:, None]).any(axis=1)
    return in1 | in2


def build_shards(seen: DataFrame, n_shards: int = 32,
                 bits_per_item: int = BLOOM_BITS_PER_ITEM) -> DataFrame:
    """seen(url_hash bigint) -> one filter row per shard, built with
    applyInPandas (each shard's hashes land on one task)."""

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(key[0])
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        n = len(hashes)
        m_bits = max(1024, int(n * bits_per_item))
        fill = (n * BLOOM_K) / m_bits
        if fill > CHURN_FILL_THRESHOLD:
            blob, kind = _build_cuckoo(hashes), "cuckoo"
        else:
            blob, kind = _build_bloom(hashes, m_bits), "bloom"
        return pd.DataFrame([{"shard_id": shard_id, "bits": blob,
                              "n_items": n, "kind": kind}])

    keyed = seen.select(
        (F.pmod(F.col("url_hash"), F.lit(n_shards))).cast("int").alias("shard_id"),
        "url_hash")
    return keyed.groupBy("shard_id").applyInPandas(build, SHARD_SCHEMA)


def prefilter_candidates(candidates: DataFrame, shards: DataFrame,
                         n_shards: int = 32) -> DataFrame:
    """Tag candidate URLs with ``maybe_seen``: shard-local vectorized
    membership probes inside mapInPandas after a broadcast of the (small)
    shard blobs. URLs tagged False are DEFINITELY unseen — they skip the
    exact anti-join entirely; True goes to exact resolution."""
    shard_rows = {int(r["shard_id"]): (r["kind"], bytes(r["bits"]), int(r["n_items"]))
                  for r in shards.collect()}
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(shard_rows)
    schema = T.StructType(candidates.schema.fields
                          + [T.StructField("maybe_seen", T.BooleanType())])

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = bc.value
        for pdf in batches:
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            shard_ids = np.mod(hashes, n_shards)
            maybe = np.ones(len(pdf), dtype=bool)
            for sid in np.unique(shard_ids):
                mask = shard_ids == sid
                entry = local.get(int(sid))
                if entry is None:
                    maybe[mask] = False
                    continue
                kind, blob, n_items = entry
                hs = hashes[mask]
                if kind == "bloom":
                    m_bits = len(blob) * 8
                    bits = np.frombuffer(blob, dtype=np.uint8)
                    maybe[mask] = _bloom_contains(bits, hs, m_bits)
                else:
                    table = np.frombuffer(blob, dtype=np.uint16).reshape(-1, 4)
                    maybe[mask] = _cuckoo_contains(table, hs)
            yield pdf.assign(maybe_seen=maybe)

    return candidates.mapInPandas(probe, schema)
