#!/usr/bin/env python
"""Supplementary noop-isolated per-leg benchmark (optimization guide §1.4).

``bench.py`` is the FROZEN driver contract; this harness exists for
optimization evidence only: it times individual registry legs (median of
``--reps``, full spread printed) with the same session factory, warm-up and
noop sink as bench.py, so a single leg can be isolated and A/B'd without
re-running the whole suite. Cited by OPTIMIZATION_r07.md.

Usage:
    python bench_extra.py q73_rolling_fingerprints q74_fingerprint_containment
    python bench_extra.py --reps 5 all          # every headline query leg
"""

from __future__ import annotations

import argparse
import json
import os
import time

HEADLINE = [
    "q01_pricing_summary", "q02_top_customers", "q07_topk_orders_per_customer",
    "q09_sessionize", "q12_range_join", "q13_event_pivot",
    "q21_quality", "q24_dedup_exact", "q25_minhash_bands",
    "q26_simhash", "q27_embedding_topk", "q28_lse_histogram",
    "q65_ivf_recall", "q73_rolling_fingerprints",
    "q74_fingerprint_containment", "q75_repetition_scores",
    "q78_decontaminate", "q96_kmeans_int8", "q109_bm25_rank",
    "q110_pq_recall",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+",
                    help="registry query names, or 'all' for the headline set")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from akf_cdparser_spark.plans.queries import REGISTRY
    from akf_cdparser_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet") \
            .write.format("noop").mode("overwrite").save()
    REGISTRY["q01_pricing_summary"][0](spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()

    names = HEADLINE if args.names == ["all"] else args.names
    out = {}
    for name in names:
        fn, _ = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        runs = []
        for _ in range(args.reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        runs.sort()
        out[name] = {"median": runs[len(runs) // 2], "spread": runs}
        print(f"{name}: med={runs[len(runs) // 2]} {runs}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus),
                      "reps": args.reps, "legs": out}))


if __name__ == "__main__":
    main()
