#!/bin/bash
# spark-submit deployment of the engine (north rule: "runs via
# spark-submit --py-files on multi-executor clusters").
#
# Packages akf_cdparser_spark as a zip and submits a crawl+extract job.
# MASTER defaults to local-cluster[2,2,1024] — two SEPARATE executor JVMs
# on this box (tests/test_multi_executor.py runs the same job in CI and
# asserts crawl order is byte-exact vs the sequential oracle); point it at
# spark://... or yarn for a real cluster, nothing else changes.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local-cluster[2,2,1024]}"
ZIP=$(mktemp -d)/akf_pkg.zip
zip -qr "$ZIP" akf_cdparser_spark -x "*__pycache__*"

JOB=$(mktemp -d)/job.py
cat > "$JOB" <<'PY'
import sys, tempfile
from pyspark.sql import SparkSession
spark = SparkSession.builder.appName("akf_submit_demo").getOrCreate()
from akf_cdparser_spark import fixtures
from akf_cdparser_spark.crawl.frontier import CrawlEngine
from akf_cdparser_spark.operators import extract as X

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
docs = X.docs_dataframe(spark, n_docs)
print("records:", X.extract_records(docs).count())
with tempfile.TemporaryDirectory() as state_dir:
    engine = CrawlEngine(spark, state_dir, n_docs,
                         host_budget=max(4, n_docs // 14))
    engine.bootstrap(fixtures.seed_urls(max(6, n_docs // 10), n_docs),
                     fixtures.robots_rules(n_docs))
    totals = engine.run(docs, generations=3)
    print("crawl totals:", totals)
    engine.close()
spark.stop()
PY

SPARK_HOME="${SPARK_HOME:-$(python -c 'import pyspark,os;print(os.path.dirname(pyspark.__file__))')}"
"$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  "$JOB" "${1:-1000}"
