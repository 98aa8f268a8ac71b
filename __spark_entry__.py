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
    """Flagship: the extraction pipeline itself — synthesize the
    deterministic interleaved spans corpus (the BASELINE.json input shape),
    run the §2 kernel distributed (spans -> fulltext -> dispatch ->
    extractors) and join the text-analytics triage (quality + language-ID +
    fingerprint) computed over the sf0.001 documents table. Exercises the
    kernel, the Arrow extraction operator AND the training-data plane in
    one smoke; stable schema, 40 + 500 rows of work, a few seconds."""
    from akf_cdparser_spark.analytics import text
    from akf_cdparser_spark.operators import extract as X

    docs = X.docs_dataframe(spark, 40)
    records = X.extract_records(docs)
    profile = records.select(
        "doc_id", "name", "wkn", "status", "established_year", "city",
        F.size("aufsichtsrat").alias("n_aufsichtsrat"),
        F.size("vorstand").alias("n_vorstand"),
        F.size("kurse").alias("n_kurse"),
        "unparsed_chars", "fulltext_chars")

    # triage over the same corpus: the kernel's fulltext projection (D2)
    # feeds the text-analytics plane as its `text` column
    ft = X.slim_docs(docs).select(
        "doc_id", F.col("doc_text").alias("text"))
    quality = text.quality_scores(ft)
    lang = text.language_id(ft).select("doc_id", "lang_guess")
    fp = text.fingerprint(ft).select("doc_id", "fingerprint64")
    triage = quality.join(lang, "doc_id").join(fp, "doc_id")
    return (profile.join(triage, "doc_id")
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
