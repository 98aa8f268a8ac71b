#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line.

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] (default 32): the relational shell, the
training-data ops (dedup/minhash/ANN/quality), the extraction kernel over
the synthetic spans corpus, and a crawl-frontier run whose URL-scheduling /
doc-parsing throughput is the authoritative metric (BASELINE.json:2).

Output: {"metric": ..., "value": <total headline seconds>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "crawl": {"urls_per_sec": ..., "docs_per_sec": ...}}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def run_bench(sf_dir: str, cpus: str) -> dict:
    from akf_cdparser_spark.session import get_spark
    from akf_cdparser_spark.plans.queries import REGISTRY
    from akf_cdparser_spark.operators import extract as X
    from akf_cdparser_spark.crawl.frontier import CrawlEngine
    from akf_cdparser_spark import fixtures

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    headline = [
        "q01_pricing_summary", "q02_top_customers", "q07_topk_orders_per_customer",
        "q09_sessionize", "q12_range_join", "q13_event_pivot",
        "q21_quality", "q24_dedup_exact", "q25_minhash_bands",
        "q26_simhash", "q27_embedding_topk", "q28_lse_histogram",
        "q65_ivf_recall",
        # round-5 text/fingerprint planes: winnowing, containment pairs,
        # Gopher repetition, 13-gram decontamination
        "q73_rolling_fingerprints", "q74_fingerprint_containment",
        "q75_repetition_scores", "q78_decontaminate",
        # round-5 second half: fixed-point int8 k-means clustering
        # (the incremental MinHash index is timed as the split
        # q93_build / q93_probe legs below — VERDICT r5 #5: the combined
        # registry call billed the one-time index WRITE to the
        # steady-state probe, hiding the sub-second probe behind 15s)
        "q96_kmeans_int8",
        # round-6: fixed-point BM25 top-k and PQ-ADC recall (first-
        # appearance baselines)
        "q109_bm25_rank", "q110_pq_recall",
    ]

    # warm-up: JVM/codegen/parquet-footer/Python-worker startup must not be
    # billed to the first measured query (it used to land on q01)
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet") \
            .write.format("noop").mode("overwrite").save()
    REGISTRY["q01_pricing_summary"][0](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()

    # median-of-3 per query: the sandbox host is shared, single-shot
    # timings carry +-30% neighbor noise. The FULL spread is emitted too
    # (VERDICT r4 #3: medians alone hid 3x host noise — a round-over-round
    # delta smaller than the same round's own min..max says nothing).
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in headline:
        fn, _ = REGISTRY[name]
        runs = []
        for _rep in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        timings[name] = round(runs[1], 3)
        spreads[name] = [round(runs[0], 3), round(runs[1], 3),
                         round(runs[-1], 3)]

    # q93 split into build/probe (VERDICT r5 #5): build = the one-time
    # index write (amortized over every later batch in production);
    # probe = the steady-state operation the operator exists for —
    # broadcast batch signatures + partition-pruned index read
    from pyspark.sql import functions as F

    from akf_cdparser_spark.analytics import dedup as D

    q93_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q93_is_new = (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
                  < F.lit("4"))
    with tempfile.TemporaryDirectory(prefix="bench_q93_idx_") as idx_path:
        for leg, action in (
                ("q93_build", lambda: D.write_minhash_index(
                    q93_docs.filter(~q93_is_new), idx_path)),
                ("q93_probe", lambda: D.probe_minhash_index(
                    spark, idx_path, q93_docs.filter(q93_is_new))
                 .write.format("noop").mode("overwrite").save())):
            runs = []
            for _rep in range(3):
                t0 = time.time()
                action()
                runs.append(time.time() - t0)
            runs.sort()
            timings[leg] = round(runs[1], 3)
            spreads[leg] = [round(runs[0], 3), round(runs[1], 3),
                            round(runs[-1], 3)]

    # PQ operator-only leg (the q93 lesson applied proactively): the
    # registry's q110_pq_recall times the recall HARNESS — PQ scan plus
    # the float brute-force oracle it is graded against. This leg times
    # the OPERATOR alone: codebook + encode + ADC scan + exact rerank.
    from akf_cdparser_spark.analytics import similarity as SIM

    q110_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    runs = []
    for _rep in range(3):
        t0 = time.time()
        SIM.pq_topk_adc(q110_emb, [0, 7, 42, 99, 123], k=5) \
            .write.format("noop").mode("overwrite").save()
        runs.append(time.time() - t0)
    runs.sort()
    timings["q110_adc_scan"] = round(runs[1], 3)
    spreads["q110_adc_scan"] = [round(runs[0], 3), round(runs[1], 3),
                                round(runs[-1], 3)]

    # extraction throughput over the synthetic spans corpus (warm single
    # shot: the corpus synthesis dominates a repeat, medians would measure
    # the cache instead of the operator)
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1500"))
    X.extract_records(X.docs_dataframe(spark, 200)) \
        .write.format("noop").mode("overwrite").save()  # warm the lane
    t0 = time.time()
    X.extract_records(X.docs_dataframe(spark, n_docs)) \
        .write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    timings["extract_records"] = round(dt, 3)
    extract_docs_per_sec = round(n_docs / dt, 1)

    # operator-only throughput: the combined number above is DOMINATED by
    # the synthetic-corpus synthesis (measured 1.16s of a 1.5s pass at
    # n=1500), so it understates the extraction operator ~3x. Materialize
    # the corpus first, then time extraction alone — this is the number to
    # compare against the reference's parse throughput (its corpus already
    # exists on disk). The combined metric stays for round-over-round
    # comparability.
    docs_mat = X.docs_dataframe(spark, n_docs).persist()
    docs_mat.count()
    t0 = time.time()
    X.extract_records(docs_mat).write.format("noop").mode("overwrite").save()
    dt_only = time.time() - t0
    docs_mat.unpersist()
    extract_only_docs_per_sec = round(n_docs / dt_only, 1)

    # crawl frontier throughput (urls scheduled + docs parsed per second);
    # generation size must dominate the fixed per-generation costs for the
    # throughput number to reflect engine capability
    # 64k docs -> ~18k-URL generations: large enough that per-generation
    # latency no longer dominates (8k's ~2.2k-URL generations measured
    # scheduling latency, not engine capability; the corpus grew 8x in
    # round 3 for ~1.3x wall time — compare crawl urls_per_sec, not
    # crawl_3gen seconds, across rounds)
    crawl_docs = int(os.environ.get("SPARK_GRAFT_BENCH_CRAWL_DOCS", "64000"))
    # round-over-round comparability: a second, SMALLER leg at the round-2
    # corpus size so wall-time comparisons across rounds need no
    # throughput normalization (VERDICT r3 bench-hygiene ask)
    crawl_docs_small = int(os.environ.get(
        "SPARK_GRAFT_BENCH_CRAWL_DOCS_SMALL", "8000"))
    # warm the crawl lane (stage types: schedule windows, bloom cogroup,
    # parse, snapshot writes) before the measured run
    with tempfile.TemporaryDirectory() as warm_dir:
        warm = CrawlEngine(spark, warm_dir, 300, host_budget=20, n_salts=4)
        warm.bootstrap(fixtures.seed_urls(30, 300), fixtures.robots_rules(300))
        warm.run(X.docs_dataframe(spark, 300), 2)

    def crawl_leg(n_docs: int, reps: int = 3) -> tuple[float, list, dict]:
        """Median-of-``reps`` fresh crawls WITH the full spread (VERDICT
        r5 #1: the crawl legs were the last ones judged without a
        dispersion — best-of-2 medians hid whether a round-over-round
        delta was engine or the documented ±30% host drift). The
        scheduled/parsed totals are schedule-deterministic (identical
        across reps), so throughput is computed from the median wall."""
        walls, tot = [], None
        for _rep in range(reps):
            with tempfile.TemporaryDirectory() as state_dir:
                engine = CrawlEngine(spark, state_dir, n_docs,
                                     host_budget=max(40, n_docs // 14),
                                     n_shards=16, n_salts=4)
                engine.bootstrap(
                    fixtures.seed_urls(max(50, n_docs // 10), n_docs),
                    fixtures.robots_rules(n_docs))
                docs = X.docs_dataframe(spark, n_docs)
                t0 = time.time()
                tot = engine.run(docs, generations=3)
                walls.append(time.time() - t0)
                engine.close()
        walls.sort()
        med = walls[len(walls) // 2]
        return med, [round(walls[0], 3), round(med, 3),
                     round(walls[-1], 3)], tot

    crawl_wall, crawl_spread, totals = crawl_leg(crawl_docs)
    timings["crawl_3gen"] = round(crawl_wall, 3)
    spreads["crawl_3gen"] = crawl_spread
    small_wall, small_spread, small_tot = crawl_leg(crawl_docs_small)
    timings["crawl_3gen_small"] = round(small_wall, 3)
    spreads["crawl_3gen_small"] = small_spread

    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline suite wall time (relational+dedup+ANN+extraction"
                  "+crawl) on local[" + cpus + "]",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # per-query [min, median, max] of the 3 reps — judge round-over-
        # round deltas against THIS dispersion, not the medians alone
        "spread": spreads,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        "extract_docs_per_sec": extract_docs_per_sec,
        "extract_only_docs_per_sec": extract_only_docs_per_sec,
        "crawl": {
            "urls_scheduled": totals["urls_scheduled"],
            "docs_parsed": totals["docs_parsed"],
            "urls_per_sec": round(totals["urls_scheduled"] / crawl_wall, 1),
            "docs_per_sec": round(totals["docs_parsed"] / crawl_wall, 1),
            "corpus_docs": crawl_docs,
        },
        "crawl_small": {
            "urls_scheduled": small_tot["urls_scheduled"],
            "docs_parsed": small_tot["docs_parsed"],
            "urls_per_sec": round(small_tot["urls_scheduled"] / small_wall, 1),
            "docs_per_sec": round(small_tot["docs_parsed"] / small_wall, 1),
            "corpus_docs": crawl_docs_small,
        },
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    result = run_bench(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
