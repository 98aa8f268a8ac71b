"""Generation-synchronous crawl frontier engine (BASELINE.json north_rule).

Scheduling semantics (shared, by construction, with the sequential oracle in
``oracle.py`` — crawl order and seen set must match EXACTLY at any
parallelism):

* the frontier holds (url, url_hash, host, next_fetch_time, depth); a URL's
  ``next_fetch_time`` is the generation in which it was discovered
  (politeness clock in ticks, not wall time — deterministic);
* each generation: dedupe candidates by url_hash (min next_fetch_time / depth),
  drop already-seen (bloom prefilter -> exact left_anti), robots-gate,
  then per host schedule at most ``host_budget`` URLs in
  (next_fetch_time, url_hash, url) order;
* the global crawl order within a generation is (next_fetch_time, url_hash,
  url) — ordering is DEFINED BY DATA, never by task scheduling;
* scheduled docs are parsed (the §2 extraction kernel); out-links are the
  extracted Beteiligungen company names resolved through the CD page-index
  dictionary (broadcast);
* disallowed URLs enter the seen set (decision made) without a fetch-log row;
* every generation commits frontier/seen/fetch_log/bloom-shards + metrics to
  the state store — resume reads the latest committed generation.

Physical plan per the north rule: the politeness queue is a SALTED
repartition-by-host-hash + sortWithinPartitions two-phase top-k (hot CD
volumes split across ``n_salts`` slices, then a tiny per-host re-rank), and
the global sequence is assigned by range-partitioned sort + per-partition
offsets — no single-partition window anywhere.
"""

from __future__ import annotations

import json
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fixtures
from ..operators import extract as X
from . import bloom
from .canonicalize import canonicalize_udf, host_of, url_hash64
from .robots import apply_robots
from .storage import StateStore

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("url_hash", T.LongType()),
    T.StructField("host", T.StringType()),
    T.StructField("next_fetch_time", T.LongType()),
    T.StructField("depth", T.IntegerType()),
])

SEEN_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType()),
    T.StructField("url", T.StringType()),
    T.StructField("generation", T.IntegerType()),
])


def _with_identity(df: DataFrame) -> DataFrame:
    canon = canonicalize_udf(F.col("url"))
    return (df.withColumn("url", canon)
            .withColumn("url_hash", url_hash64("url"))
            .withColumn("host", host_of("url")))


def seeds_frontier(spark: SparkSession, seeds: list[dict]) -> DataFrame:
    df = spark.createDataFrame(
        [(s["url"],) for s in seeds], T.StructType([T.StructField("url", T.StringType())]))
    return (_with_identity(df)
            .withColumn("next_fetch_time", F.lit(0).cast("long"))
            .withColumn("depth", F.lit(0))
            .select([f.name for f in FRONTIER_SCHEMA.fields]))


def global_sequence(df: DataFrame, order_cols: list[str], start: int,
                    out_col: str = "scheduled_seq") -> tuple[DataFrame, int]:
    """Deterministic global rank without a single-partition window:
    range-partitioned sort, per-partition row_number, driver-side offsets
    (one tiny count per partition). Returns (df, n_rows) — the count comes
    free from the offsets pass."""
    n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism // 2)
    ordered = (df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
               .withColumn("_pid", F.spark_partition_id()))
    ordered = ordered.persist()
    counts = {r["_pid"]: r["n"] for r in
              ordered.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    if not counts:
        return ordered.drop("_pid").withColumn(out_col, F.lit(start)), 0
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = (ordered
           .withColumn(out_col, omap[F.col("_pid")] + F.row_number().over(w) - 1)
           .drop("_pid"))
    return out, acc - start


def schedule_generation(candidates: DataFrame, host_budget: int,
                        n_salts: int = 8) -> DataFrame:
    """Per-host politeness top-k, two-phase: (host, salt) slices first (the
    salted repartition that splits hot CD volumes), then a per-host re-rank
    over at most budget*n_salts survivors.

    Hosts whose candidate count is within budget bypass BOTH windows —
    top-k over <=k rows is the identity, and the per-host re-rank would
    otherwise sort the bulk of the frontier in one task per host (there
    are only a handful of CD-volume hosts: the single worst scaling
    bottleneck). The count split changes the physical plan only; the
    scheduled set is identical for any budget."""
    order = [F.asc("next_fetch_time"), F.asc("url_hash"), F.asc("url")]
    host_counts = candidates.groupBy("host").agg(F.count("*").alias("_hc"))
    with_counts = candidates.join(F.broadcast(host_counts), "host")
    under = with_counts.filter(F.col("_hc") <= host_budget).drop("_hc")
    over = with_counts.filter(F.col("_hc") > host_budget).drop("_hc")

    salted = over.withColumn(
        "salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int"))
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    survivors = (salted.withColumn("_r1", F.row_number().over(w1))
                 .filter(F.col("_r1") <= host_budget).drop("_r1"))
    w2 = Window.partitionBy("host").orderBy(*order)
    topk = (survivors.withColumn("_r2", F.row_number().over(w2))
            .filter(F.col("_r2") <= host_budget)
            .drop("_r2", "salt"))
    return under.unionByName(topk)


def page_index_df(spark: SparkSession, n_docs: int) -> DataFrame:
    """CD page index as a DATAFRAME, synthesized distributively (no
    O(n_docs) driver loop — at the 10^10 design point the index itself is
    big data): company name -> canonical URL, min doc index wins."""
    partitions = max(2, min(64, n_docs // 4096 or 2))
    base = spark.range(0, n_docs, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = [int(i) for i in pdf["id"]]
            yield pd.DataFrame({
                "name": [fixtures.company_name(i) for i in idx],
                "url": [fixtures.url_for(i) for i in idx],
            })

    raw = base.mapInPandas(
        gen, T.StructType([T.StructField("name", T.StringType()),
                           T.StructField("url", T.StringType())]))
    # min-doc-wins dedupe rule (fixtures.url_for is monotone in doc index)
    return raw.groupBy("name").agg(F.min("url").alias("url"))


def discover_links(parsed: DataFrame, page_index: DataFrame) -> DataFrame:
    """Out-links from CONTENT: extract the Beteiligungen target names in a
    vectorized pass, then resolve them with a JOIN against the page-index
    DataFrame (AQE broadcasts it while small; at scale it shuffles — either
    way no driver-side materialization)."""
    schema = T.StructType([T.StructField("src_doc_id", T.StringType()),
                           T.StructField("name", T.StringType())])

    def extract_names(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, rec_json in zip(pdf["doc_id"], pdf["record_json"]):
                if not rec_json:
                    continue
                rec = json.loads(rec_json)
                for group in rec.get("beteiligungen") or []:
                    for zeile in group.get("zeilen") or []:
                        if isinstance(zeile, dict):
                            name = (zeile.get("beteiliger") or "").strip()
                            if name:
                                rows.append({"src_doc_id": doc_id, "name": name})
            yield pd.DataFrame(rows, columns=["src_doc_id", "name"])

    names = parsed.select("doc_id", "record_json").mapInPandas(
        extract_names, schema)
    return names.join(page_index, "name").select("src_doc_id", "url")


def _doc_id_from_url():
    return F.regexp_extract("url", r"cd(\d{4}/\d+)\.html$", 1)


def resolve_docs(scheduled: DataFrame, docs_slim: DataFrame) -> DataFrame:
    """'Fetch': map scheduled URLs to the (slimmed) docs store. URL ->
    doc_id is the synthesis rule (akf://cdYYYY/NNNN.html <-> YYYY/NNNN).
    The SCHEDULED side broadcasts (a generation's keys are tiny next to the
    store) so the multi-TB docs side never shuffles — at generation sizes
    where the key set outgrows broadcast, drop the hint and let AQE pick."""
    keys = (scheduled.withColumn("doc_id", _doc_id_from_url())
            .select("url_hash", "doc_id"))
    return docs_slim.join(F.broadcast(keys), "doc_id")


class CrawlEngine:
    def __init__(self, spark: SparkSession, state_dir: str, n_docs: int,
                 host_budget: int = 4, n_shards: int = 16, n_salts: int = 4,
                 bloom_rebuild_every: int = 2,
                 shuffle_partitions: int | None = None):
        self.spark = spark
        self.store = StateStore(spark, state_dir)
        self.n_docs = n_docs
        self.host_budget = host_budget
        self.n_shards = n_shards
        self.n_salts = n_salts
        # stale shards are safe: bloom is a prefilter, exactness comes from
        # the left_anti against the exact seen set — rebuilding every K
        # generations only trades a few extra "maybe" probes for K-1 fewer
        # rebuild jobs per cycle
        self.bloom_rebuild_every = max(1, bloom_rebuild_every)
        # scheduling frames are small relative to cluster width — a capped
        # shuffle width avoids paying task overhead on near-empty partitions;
        # None = auto-sized per generation from the last scheduled count
        self.shuffle_partitions = shuffle_partitions
        # shard_id -> n_items at the last bloom rebuild (tiny metadata,
        # drives the churn-based cuckoo spill)
        self._shard_counts: dict[int, int] = {}
        # engine-lifetime caches: slimmed doc store + page index survive
        # across run() calls so steady-state generations never pay the
        # one-time materialization again
        self._docs_key: int | None = None
        self._docs_slim: DataFrame | None = None
        self._index: DataFrame | None = None

    def close(self) -> None:
        for df in (self._docs_slim, self._index):
            if df is not None:
                df.unpersist()
        self._docs_key, self._docs_slim, self._index = None, None, None

    # -- state access -------------------------------------------------------

    def _empty(self, schema) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _read_seen(self) -> DataFrame:
        """Union of all committed per-generation seen deltas (append-only)."""
        import os
        root = os.path.join(self.store.root, "seen")
        return (self.spark.read.schema(SEEN_SCHEMA).parquet(root)
                .select([f.name for f in SEEN_SCHEMA.fields]))

    def bootstrap(self, seeds: list[dict], robots_rules: list[dict]) -> None:
        frontier = seeds_frontier(self.spark, seeds)
        self.store.write("frontier", frontier, 0)
        self.store.write("seen", self._empty(SEEN_SCHEMA), 0)
        self.store.write("robots", self.spark.createDataFrame(
            robots_rules, "host string, rule string, allow boolean"), 0)
        self.store.commit(0, ["frontier", "seen", "robots"], {"bootstrap": True})

    def _auto_width(self, last_scheduled: int | None) -> int:
        """Shuffle width sized to generation row counts, floored at the
        cluster width: never fewer partitions than cores (the parse stage
        inherits this width from the scheduling join and must keep every
        core busy), never so many that tiny frames pay per-task overhead
        on near-empty partitions."""
        if self.shuffle_partitions:
            return self.shuffle_partitions
        cores = self.spark.sparkContext.defaultParallelism
        if not last_scheduled:
            return cores
        return max(cores, min(4 * cores, last_scheduled // 2000 + cores))

    def run(self, docs: DataFrame, generations: int) -> dict:
        """Run ``generations`` crawl generations from the latest checkpoint.
        Returns summary metrics. Resumable: re-invoking continues.

        Scale discipline: frontier + seen live as CACHED DataFrames across
        generations (write-behind: per-generation deltas/snapshots are
        committed for durability, but the hot loop never re-reads them);
        the page index is built once per run; snapshot writes overlap via a
        thread pool and only the commit barrier waits for them."""
        start_gen = self.store.latest_generation()
        if start_gen is None:
            raise RuntimeError("bootstrap() first")
        prev_shuffle = self.spark.conf.get("spark.sql.shuffle.partitions")
        robots = self.store.read("robots", 0)
        totals = {"urls_scheduled": 0, "docs_parsed": 0, "wall_ms": 0}
        # slim the store ONCE per engine: flat (doc_id, doc_text, n_media)
        # columns cache and join far cheaper than nested span structs
        # (see X.slim_docs); reused across run() calls
        if self._docs_slim is None or self._docs_key != id(docs):
            self.close()
            self._docs_key = id(docs)
            self._docs_slim = X.slim_docs(docs).persist()
            self._index = page_index_df(self.spark, self.n_docs).persist()
        docs, index = self._docs_slim, self._index
        frontier = self.store.read("frontier", start_gen).persist()
        seen = self._read_seen().persist()
        last_sched = self.store.latest_stats().get("urls_scheduled")
        try:
            for gen in range(start_gen + 1, start_gen + 1 + generations):
                t0 = time.time()
                self.spark.conf.set("spark.sql.shuffle.partitions",
                                    str(self._auto_width(last_sched)))
                seq_start = int(self.store.latest_stats().get("seq_end", 0))
                stats, frontier_next, seen_next = self._generation(
                    gen, frontier, seen, robots, docs, seq_start, index)
                stats["seq_end"] = seq_start + stats["urls_scheduled"]
                stats["wall_ms"] = int((time.time() - t0) * 1000)
                self.store.commit(gen, ["frontier", "seen", "fetch_log"], stats)
                totals["urls_scheduled"] += stats["urls_scheduled"]
                totals["docs_parsed"] += stats["docs_parsed"]
                totals["wall_ms"] += stats["wall_ms"]
                last_sched = stats["urls_scheduled"]
                frontier.unpersist()
                seen.unpersist()
                frontier, seen = frontier_next, seen_next
                if stats["urls_scheduled"] == 0:
                    break
        finally:
            # docs/index stay cached on the engine (see close())
            self.spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        return totals

    def _generation(self, gen: int, frontier: DataFrame, seen: DataFrame,
                    robots: DataFrame, docs: DataFrame, seq_start: int,
                    index: DataFrame) -> tuple[dict, DataFrame, DataFrame]:
        import os as _os
        _dbg = _os.environ.get("AKF_CRAWL_DEBUG")
        _t = time.time()

        def _mark(label):
            nonlocal _t
            if _dbg:
                now = time.time()
                print(f"    gen{gen} {label}: {now - _t:.2f}s", flush=True)
                _t = now
        # 1. dedupe frontier by identity hash (deterministic reduce)
        cand = (frontier.groupBy("url_hash")
                .agg(F.min("url").alias("url"),
                     F.min("host").alias("host"),
                     F.min("next_fetch_time").alias("next_fetch_time"),
                     F.min("depth").alias("depth")))

        # 2. unseen filter: bloom/cuckoo prefilter, exact anti-join resolve
        shard_gen = next((g for g in range(gen - 1, 0, -1)
                          if self.store.exists("bloom_shards", g)), None)
        if shard_gen is not None:
            shards = self.store.read("bloom_shards", shard_gen)
            tagged = bloom.prefilter_candidates(cand, shards, self.n_shards)
            definitely_new = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            needs_check = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
            # shards may be a few generations stale: a 'definitely unseen'
            # verdict only covers the set as of shard_gen — still anti-join
            # the (small) deltas seen since then, or a recently-seen URL
            # would be re-scheduled
            recent = seen.filter(F.col("generation") > shard_gen)
            definitely_new = definitely_new.join(
                recent.select("url_hash"), "url_hash", "left_anti")
            resolved = needs_check.join(
                seen.select("url_hash"), "url_hash", "left_anti")
            unseen = definitely_new.unionByName(resolved)
        else:
            unseen = cand.join(seen.select("url_hash"), "url_hash", "left_anti")

        # 3. robots gate (broadcast prefix rules); persisted — the gated set
        # feeds scheduling AND two state writes, don't recompute the chain
        gated = apply_robots(unseen, robots).persist()
        allowed = gated.filter(F.col("allowed")).drop("allowed")
        disallowed = gated.filter(~F.col("allowed")).drop("allowed")

        # 4. politeness schedule + deterministic global crawl order.
        # Persist BEFORE sequencing: repartitionByRange runs a sampling pass
        # over its input, which would otherwise re-execute the whole
        # dedupe->bloom->robots->window chain a second time per generation.
        pre = schedule_generation(allowed, self.host_budget,
                                  self.n_salts).persist()
        scheduled, n_scheduled = global_sequence(
            pre, ["next_fetch_time", "url_hash", "url"], seq_start)
        scheduled = scheduled.persist()
        _mark("schedule+sequence")

        # 5. fetch + parse + discover (docs side stays put: broadcast keys);
        # the coverage plane is a separate QA query, not a per-fetch cost
        fetched = resolve_docs(scheduled, docs)
        parsed = X.extract_records_slim(
            fetched.select("doc_id", "doc_text", "n_media"),
            with_coverage=False)
        parsed = parsed.persist()
        n_parsed = parsed.count()  # the one action that materializes parse
        _mark("parse")
        links = discover_links(parsed, index)
        new_frontier_rows = (_with_identity(links.select("url").distinct())
                             .withColumn("next_fetch_time", F.lit(gen).cast("long"))
                             .withColumn("depth", F.lit(gen))
                             .select([f.name for f in FRONTIER_SCHEMA.fields]))

        # 6. state transition (all joins, no first-writer-wins anywhere);
        # seen is APPEND-ONLY: only this generation's delta is written
        newly_seen = (scheduled.select("url_hash", "url")
                      .unionByName(disallowed.select("url_hash", "url"))
                      .withColumn("generation", F.lit(gen))).persist()
        # localCheckpoint TRUNCATES the logical plan: without it the
        # cross-generation union/join lineage grows exponentially and plan
        # analysis alone dominates (minutes of TreeNode.treeString CPU by
        # generation 3). The parquet snapshot written below stays the
        # durable copy; the checkpoint only backs the hot loop.
        # persist the plan so the parquet write and the checkpoint (both in
        # the barrier below) share ONE materialization instead of running
        # serially after each other
        frontier_next_plan = (frontier
                              .join(newly_seen.select("url_hash"),
                                    "url_hash", "left_anti")
                              .unionByName(new_frontier_rows)).persist()
        seen_next_plan = seen.unionByName(newly_seen)

        # incremental log: only this generation's delta is written; readers
        # union the per-generation partitions (never rewrite a growing log).
        # doc_id comes straight from the URL synthesis rule — no docs join.
        fetch_log_new = (scheduled
                         .withColumn("doc_id", _doc_id_from_url())
                         .select("scheduled_seq", "url_hash", "url", "doc_id")
                         .withColumn("generation", F.lit(gen)))

        # 7. lineage + metrics planes (from the cached parse — no re-parse)
        lineage = X.lineage_table(parsed).withColumn("generation", F.lit(gen))
        metrics = (X.metrics_table(parsed)
                   .groupBy("category")
                   .agg(F.sum("call_count").alias("call_count"))
                   .withColumn("generation", F.lit(gen)))

        # 8. WRITE-BEHIND snapshot: every job here reads only cached /
        # deterministic inputs, so checkpoint materialization and the table
        # writes all overlap on a thread pool; the commit barrier (below)
        # is the only wait. Cuts the serial fixed-cost chain that throttled
        # crawl-loop scaling.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as pool:
            ckpt_frontier = pool.submit(frontier_next_plan.localCheckpoint)
            ckpt_seen = pool.submit(seen_next_plan.localCheckpoint)
            futures = [pool.submit(self.store.write, name, df, gen)
                       for name, df in (("seen", newly_seen),
                                        ("frontier", frontier_next_plan),
                                        ("fetch_log", fetch_log_new),
                                        ("lineage", lineage),
                                        ("metrics", metrics))]
            frontier_next = ckpt_frontier.result()
            seen_next = ckpt_seen.result()
            if gen % self.bloom_rebuild_every == 0:
                shards = bloom.build_shards(seen_next, self.n_shards,
                                            prev_counts=self._shard_counts)
                futures.append(pool.submit(
                    self.store.write, "bloom_shards", shards, gen))
            for fut in futures:
                fut.result()  # surface failures before the commit record
        _mark("write barrier")
        frontier_next_plan.unpersist()
        if gen % self.bloom_rebuild_every == 0:
            self._shard_counts = bloom.shard_counts(
                self.store.read("bloom_shards", gen))
        gated.unpersist()
        newly_seen.unpersist()
        pre.unpersist()
        scheduled.unpersist()
        parsed.unpersist()
        return ({"urls_scheduled": n_scheduled, "docs_parsed": n_parsed},
                frontier_next, seen_next)

    # -- results -------------------------------------------------------------

    def fetch_log(self) -> DataFrame:
        """Union of all committed per-generation log deltas."""
        import os
        root = os.path.join(self.store.root, "fetch_log")
        return self.spark.read.parquet(root)

    def seen(self) -> DataFrame:
        return self._read_seen()
