#!/usr/bin/env python
"""Interleaved A/B control bench: HEAD vs a given git rev (VERDICT r4 #3).

Round-over-round bench deltas on this shared host are noise-dominated
(same-query spread within one session reached 3x in round 4). The honest
way to claim "version B is slower than version A" is to run BOTH versions
interleaved, minutes apart, on the same host: A,B,A,B,... in fresh JVMs.
This script checks the control rev out into a temp git worktree and
alternates per rep, printing per-(version, query) [min, median, max].

Usage:
    PYTHONPATH=. python scripts/bench_control.py <rev> [reps] [q1,q2,...]
Defaults: reps=3, queries=q01_pricing_summary,q25_minhash_bands,q26_simhash
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
names = sys.argv[1].split(",")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
from akf_cdparser_spark.session import get_spark
from akf_cdparser_spark.plans.queries import REGISTRY
spark = get_spark(app_name="bench_ctrl", master=f"local[{cpus}]",
                  shuffle_partitions=max(8, int(cpus)))
for t in ("lineitem", "orders", "customer", "events", "documents",
          "embeddings"):
    spark.read.parquet(f"{sf_dir}/{t}.parquet") \
        .write.format("noop").mode("overwrite").save()
for _n in names:  # warm the query lane (crawl legs warm themselves)
    if not _n.startswith("crawl_3gen"):
        REGISTRY[_n][0](spark, sf_dir) \
            .write.format("noop").mode("overwrite").save()
        break
def crawl_leg(n_docs):
    # one fresh 3-generation crawl at the bench corpus size, after the
    # same small warm-up crawl bench.py runs (stage types: schedule
    # windows, bloom cogroup, parse, snapshot writes)
    import tempfile
    from akf_cdparser_spark import fixtures
    from akf_cdparser_spark.crawl.frontier import CrawlEngine
    from akf_cdparser_spark.operators import extract as X
    with tempfile.TemporaryDirectory() as warm_dir:
        warm = CrawlEngine(spark, warm_dir, 300, host_budget=20, n_salts=4)
        warm.bootstrap(fixtures.seed_urls(30, 300), fixtures.robots_rules(300))
        warm.run(X.docs_dataframe(spark, 300), 2)
    with tempfile.TemporaryDirectory() as state_dir:
        engine = CrawlEngine(spark, state_dir, n_docs,
                             host_budget=max(40, n_docs // 14),
                             n_shards=16, n_salts=4)
        engine.bootstrap(fixtures.seed_urls(max(50, n_docs // 10), n_docs),
                         fixtures.robots_rules(n_docs))
        docs = X.docs_dataframe(spark, n_docs)
        t0 = time.time()
        engine.run(docs, generations=3)
        wall = time.time() - t0
        engine.close()
    return wall

out = {}
for name in names:
    if name.startswith("crawl_3gen"):
        # pseudo-leg: "crawl_3gen" (64k docs) or "crawl_3gen:<n_docs>"
        n_docs = int(name.split(":", 1)[1]) if ":" in name else 64000
        out[name] = round(crawl_leg(n_docs), 3)
        continue
    fn, _ = REGISTRY[name]
    # discard the first run: it pays per-JVM codegen/plan compile, a
    # one-time cost that round-over-round comparisons must not bill to
    # the steady-state operator (plans with more generated code would
    # read as regressions). The recorded run is warm.
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
print("RESULT " + json.dumps(out))
"""


def run_side(path: str, queries: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=path)
    out = subprocess.run([sys.executable, "-c", WORKER, ",".join(queries)],
                         capture_output=True, text=True, cwd=path, env=env,
                         check=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    rev = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    queries = (sys.argv[3].split(",") if len(sys.argv) > 3 else
               ["q01_pricing_summary", "q25_minhash_bands", "q26_simhash"])

    with tempfile.TemporaryDirectory(prefix="akf_ctrl_") as wt:
        subprocess.run(["git", "worktree", "add", "--detach", wt, rev],
                       cwd=REPO, check=True, capture_output=True)
        try:
            runs: dict[str, list[dict]] = {"HEAD": [], rev: []}
            for rep in range(reps):
                # interleave AND alternate which side goes first (ABBA):
                # measured on this host (round 6, crawl_3gen), the
                # FIRST-of-pair position reads up to ~40% slower than the
                # second regardless of which version occupies it — a
                # fixed order would misattribute that position penalty to
                # one version (it did: HEAD-first read a spurious 1.36x
                # "regression" that flipped to 1.05 when swapped)
                sides = [("HEAD", REPO), (rev, wt)]
                if rep % 2:
                    sides.reverse()
                for label, path in sides:
                    runs[label].append(run_side(path, queries))
                print(f"rep {rep + 1}/{reps}: "
                      f"HEAD={runs['HEAD'][-1]} {rev}={runs[rev][-1]}",
                      flush=True)
        finally:
            subprocess.run(["git", "worktree", "remove", "--force", wt],
                           cwd=REPO, capture_output=True)

    print("\n| query | HEAD [min, med, max] | "
          f"{rev} [min, med, max] | med ratio |")
    print("|---|---|---|---|")
    for q in queries:
        a = sorted(r[q] for r in runs["HEAD"])
        b = sorted(r[q] for r in runs[rev])
        med_a, med_b = statistics.median(a), statistics.median(b)
        print(f"| {q} | [{a[0]}, {med_a}, {a[-1]}] "
              f"| [{b[0]}, {med_b}, {b[-1]}] "
              f"| {round(med_a / med_b, 2)} |")


if __name__ == "__main__":
    main()
