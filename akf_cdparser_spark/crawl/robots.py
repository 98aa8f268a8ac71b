"""robots.txt gating: a small rules table broadcast-joined against candidate
URLs, longest-matching prefix rule wins (standard robots semantics).

The rules table is tiny (one row per host × path prefix) — classic broadcast
dimension; the candidate side streams, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import host_of


def apply_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """candidates(url, host, ...) x robots(host, rule, allow) -> candidates
    with ``allowed`` per longest-prefix rule; hosts with no rules default to
    allowed.

    Window-free plan: rules are aggregated per host into an array, broadcast,
    and the longest matching prefix is picked with a single JVM-side
    ``aggregate`` over that (tiny) array — one broadcast join, no shuffle,
    no per-URL row_number."""
    path = F.regexp_replace(F.col("url"), r"^[a-z0-9+.\-]+://[^/]*", "")
    per_host = (robots.groupBy("host")
                .agg(F.collect_list(F.struct("rule", "allow")).alias("_rules"))
                .withColumnRenamed("host", "_rhost"))
    cand = (candidates.withColumn("_path", path)
            .join(F.broadcast(per_host),
                  F.col("host") == F.col("_rhost"), "left"))
    best = F.aggregate(
        F.coalesce(F.col("_rules"), F.array()),
        F.struct(F.lit(-1).alias("rlen"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            F.col("_path").startswith(r.rule) & (F.length(r.rule) > acc.rlen),
            F.struct(F.length(r.rule).alias("rlen"), r.allow.alias("allow"))
        ).otherwise(acc))
    return (cand.withColumn("allowed", best.allow)
            .drop("_rhost", "_rules", "_path"))


def robots_allowed_py(url: str, rules: list[dict]) -> bool:
    """Pure-Python twin for the sequential oracle."""
    import re
    host_m = re.match(r"^([a-z0-9+.\-]+://[^/]+)", url)
    host = host_m.group(1) if host_m else ""
    path = url[len(host):]
    best = None
    for r in rules:
        if r["host"] == host and path.startswith(r["rule"]):
            if best is None or len(r["rule"]) > len(best["rule"]):
                best = r
    return best["allow"] if best else True
