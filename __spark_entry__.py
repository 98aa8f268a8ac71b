"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: load sf0.001 parquet docs, run the combined
text-analytics profile (quality + language-ID + fingerprint) — the
training-data triage pass every corpus gets before extraction.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, backed by akf_cdparser_spark.plans.queries.REGISTRY: the
relational shell (joins/windows/aggregations the crawl frontier is built
from), the text/dedup/similarity training-data ops, and the extraction
kernel run end-to-end over the deterministic synthetic spans corpus with
closed-form SQL oracles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from akf_cdparser_spark.analytics import text

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    quality = text.quality_scores(docs)
    lang = text.language_id(docs).select("doc_id", "lang", "lang_guess")
    fp = text.fingerprint(docs).select("doc_id", "fingerprint64")
    return (quality.join(lang, "doc_id").join(fp, "doc_id")
            .orderBy(F.asc("doc_id")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from akf_cdparser_spark.plans.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted entries get the
    driver's weaker rows-only check)."""
    from akf_cdparser_spark.plans.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql}
