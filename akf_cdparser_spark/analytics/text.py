"""Text analysis over a document corpus — language-ID heuristic, quality
scoring, token counting, fingerprinting, and the reference's LSE token-class
histogram (lib/lineSegmentAnalyzer.js) re-expressed relationally.

Everything here is pure ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) — no Python in the hot path. Each op has an exact DuckDB-SQL twin
in plans/queries.py so the driver's oracle can value-hash it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deterministic tiny stopword lists for the language-ID heuristic
DE_STOPWORDS = ("der", "die", "das", "und", "nicht", "mit", "ist", "von")
EN_STOPWORDS = ("the", "and", "not", "with", "is", "of", "to", "a")


def tokens_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization matching DuckDB regexp_split_to_array
    semantics on trimmed input."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


def _count_hits(words: tuple[str, ...]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    hits = None
    for w in words:
        h = (F.length(padded)
             - F.length(F.replace(padded, F.lit(f" {w} "), F.lit("")))
             ) / (len(w) + 2)
        hits = h if hits is None else hits + h
    return hits.cast("long")


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a flag."""
    n_tokens = F.size(tokens_col())
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    stop_hits = _count_hits(DE_STOPWORDS + EN_STOPWORDS)
    out = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct / F.greatest(F.length("text"), F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(F.length("text") / F.greatest(n_tokens, F.lit(1)), 4).alias("avg_token_len"),
    )
    return out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 5) & (F.col("punct_ratio") < 0.3))


def language_id(docs: DataFrame) -> DataFrame:
    """N-gram/stopword-hit language heuristic: de vs en by function-word
    hits; 'und' (unknown/undetermined) when neither side scores."""
    de = _count_hits(DE_STOPWORDS)
    en = _count_hits(EN_STOPWORDS)
    return docs.select(
        "doc_id", "lang",
        de.alias("de_hits"), en.alias("en_hits"),
        F.when(de > en, "de").when(en > de, "en").otherwise("und").alias("lang_guess"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (the exact-dedup key) plus a 64-bit integer form for bucketing — both
    reproducible bit-for-bit in any engine with md5."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = F.md5(norm)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fingerprint64"),
    )


def lse_histogram(docs: DataFrame, n_sectors: int = 10) -> DataFrame:
    """Line-segment token-class histogram (reference A3,
    lib/lineSegmentAnalyzer.js:115-758): classify each token
    (number / word / bracketed / special), normalize its position into
    ``n_sectors`` deciles, count occurrences per (sector, class)."""
    toks = docs.select(
        "doc_id",
        F.posexplode(tokens_col()).alias("pos", "token"),
        F.size(tokens_col()).alias("n_tokens"),
    )
    klass = (
        F.when(F.col("token").rlike(r"^\d+([.,]\d+)?$"), "number")
        .when(F.col("token").rlike(r"^\(.*\)$"), "inBrackets")
        .when(F.col("token").rlike(r"^[A-Za-zÄÖÜäöüß\-]+$"), "word")
        .otherwise("specialcharacter")
    )
    sector = F.least(
        F.floor(F.col("pos") * n_sectors / F.greatest("n_tokens", F.lit(1))),
        F.lit(n_sectors - 1)).cast("int")
    return (toks
            .select(sector.alias("sector"), klass.alias("token_class"))
            .groupBy("sector", "token_class")
            .agg(F.count("*").alias("occurrences")))
