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
