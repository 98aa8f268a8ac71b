"""Sitemap protocol ingestion (sitemaps.org XML): the URL-discovery side
channel a production crawler runs next to link extraction — a <urlset>
yields page URLs (+ optional lastmod), a <sitemapindex> yields child
sitemap URLs to fetch next round.

Parsing is regex-over-text on purpose: sitemap files are machine-generated
and schema-fixed, the (?s) non-greedy block patterns live in the
Java-regex ∩ RE2 subset so the DuckDB oracle runs them verbatim, and no
XML library lands on the 100-TB hot path. Everything is a projection —
regexp_extract_all + a per-block transform, zero shuffles, codegen
end-to-end; the explode fans out in place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_SITEMAP_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """sitemaps(host, xml) -> one row per discovered URL:
    ``(host, kind, url, lastmod)`` where ``kind`` is ``'url'`` for
    <urlset> page entries and ``'sitemap'`` for <sitemapindex> children
    (fetch those and feed them back through this operator); ``lastmod``
    is the raw W3C datetime string or NULL. Blocks without a <loc> are
    dropped (spec: loc is required)."""
    def entries(block_re: str, kind: str):
        blocks = F.regexp_extract_all("xml", F.lit(block_re), 1)
        return (sitemaps
                .select("host", F.explode(blocks).alias("_b"))
                .select(
                    "host",
                    F.lit(kind).alias("kind"),
                    F.regexp_extract("_b", _LOC_RE, 1).alias("url"),
                    F.nullif(F.regexp_extract("_b", _LASTMOD_RE, 1),
                             F.lit("")).alias("lastmod"))
                .filter(F.col("url") != ""))

    return entries(_URL_BLOCK_RE, "url").unionByName(
        entries(_SITEMAP_BLOCK_RE, "sitemap"))


def sitemap_seeds(sitemaps: DataFrame) -> DataFrame:
    """The page-URL plane of ``parse_sitemaps`` shaped as frontier seeds:
    distinct ``(url)`` rows ready for ``CrawlEngine.bootstrap`` (the
    engine canonicalizes, hashes and politeness-partitions them — the
    sitemap channel injects candidates, it never bypasses the seen set or
    robots gating)."""
    return (parse_sitemaps(sitemaps)
            .filter(F.col("kind") == "url")
            .select("url").distinct())

# -- freshness / recrawl -----------------------------------------------------

_W3C_RE = (r"^(\d{4})-(\d{2})-(\d{2})"
           r"(?:[Tt](\d{2}):(\d{2})(?::(\d{2})(?:\.\d+)?)?"
           r"(Z|[+-]\d{2}:\d{2})?)?$")


def w3c_lastmod_unix(col) -> "F.Column":
    """W3C datetime (the <lastmod> format: ``YYYY-MM-DD`` or
    ``YYYY-MM-DDThh:mm(:ss(.frac)?)?(Z|±hh:mm)``) -> unix seconds, NULL on
    anything unparseable.

    Implemented as regexp part-extraction + the days-from-civil integer
    formula (Howard Hinnant's ``days_from_civil``; also libc++'s
    chrono implementation) rather than ``to_timestamp``: engine timestamp
    parsers disagree on session time zones, lenient fields and fractional
    seconds, while this closed form is plain integer arithmetic that Spark
    and DuckDB evaluate bit-identically — the property every hash-gated
    oracle in this repo is built on (the fixed-point-PageRank precedent).
    All intermediates are positive for years >= 1583, so ``floor(a/b)``
    equals integer division in both engines. Missing time zone reads as
    UTC (lenient; W3C requires TZD when a time is present)."""
    c = F.col(col) if isinstance(col, str) else col
    part = [F.regexp_extract(c, _W3C_RE, g) for g in range(8)]
    y = part[1].try_cast("long")
    m = part[2].try_cast("long")
    d = part[3].try_cast("long")
    hh = F.coalesce(part[4].try_cast("long"), F.lit(0))
    mi = F.coalesce(part[5].try_cast("long"), F.lit(0))
    ss = F.coalesce(part[6].try_cast("long"), F.lit(0))
    tzd = F.nullif(part[7], F.lit(""))
    off_sign = F.when(F.substring(tzd, 1, 1) == "-", F.lit(-1)).otherwise(
        F.lit(1)).cast("long")
    off = F.coalesce(
        F.when(tzd == "Z", F.lit(0)).otherwise(
            off_sign * (F.substring(tzd, 2, 2).try_cast("long") * 3600
                        + F.substring(tzd, 5, 2).try_cast("long") * 60)),
        F.lit(0))
    yy = y - (m <= 2).cast("long")
    era = F.floor(yy / 400).cast("long")
    yoe = yy - era * 400
    mp = (m + 9) % 12
    doy = F.floor((153 * mp + 2) / 5).cast("long") + d - 1
    doe = (yoe * 365 + F.floor(yoe / 4).cast("long")
           - F.floor(yoe / 100).cast("long") + doy)
    days = era * 146097 + doe - 719468
    unix = days * 86400 + hh * 3600 + mi * 60 + ss - off
    valid = ((part[1] != "") & (m >= 1) & (m <= 12) & (d >= 1) & (d <= 31)
             & (hh <= 23) & (mi <= 59) & (ss <= 60))
    return F.when(valid, unix).otherwise(F.lit(None).cast("long"))


def freshness_recrawl(entries: DataFrame, fetch_log: DataFrame,
                      gen_seconds: int, epoch0: int) -> DataFrame:
    """Sitemap ``lastmod`` -> recrawl schedule: which ALREADY-FETCHED URLs
    changed since their last fetch, and the generation whose logical clock
    first covers the change.

    The crawl's clock is logical (``next_fetch_time`` = discovery
    generation), so freshness maps wall time onto it deterministically:
    generation ``g`` fetches at ``epoch0 + g * gen_seconds``. A page whose
    newest ``lastmod`` exceeds its last fetch instant is STALE; its
    ``recrawl_gen = (lastmod_ts - epoch0) DIV gen_seconds + 1`` is the
    first generation that runs after the change — feed the output into the
    next crawl epoch (``CrawlEngine.bootstrap(seeds=..., seen=carry)``
    with the stale hashes dropped from the carried seen set, see
    ``tests/test_crawl.py::test_recrawl_epoch_*``).

    Never-fetched sitemap URLs are the DISCOVERY plane
    (``sitemap_seeds``), not recrawl — inner join drops them. Both sides
    pre-aggregate to one row per URL before the join (newest lastmod /
    latest fetch), so the join carries |distinct urls| rows, no sitemap x
    fetch-history fanout; everything is built-ins, codegen end-to-end."""
    pages = (parse_sitemaps(entries)
             .filter((F.col("kind") == "url") & F.col("lastmod").isNotNull())
             .select("url", w3c_lastmod_unix("lastmod").alias("lastmod_ts"))
             .filter(F.col("lastmod_ts").isNotNull())
             .groupBy("url").agg(F.max("lastmod_ts").alias("lastmod_ts")))
    last = (fetch_log.groupBy("url")
            .agg(F.max("gen").alias("last_fetch_gen")))
    ge, e0 = F.lit(int(gen_seconds)), F.lit(int(epoch0))
    return (pages.join(last, "url")
            .withColumn("last_fetch_ts", e0 + F.col("last_fetch_gen") * ge)
            .filter(F.col("lastmod_ts") > F.col("last_fetch_ts"))
            .select("url", "lastmod_ts", "last_fetch_gen",
                    (F.floor((F.col("lastmod_ts") - e0) / ge).cast("long")
                     + 1).alias("recrawl_gen")))
