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
    allowed."""
    path = F.regexp_replace(F.col("url"), r"^[a-z0-9+.\-]+://[^/]*", "")
    cand = candidates.withColumn("_path", path)
    r = robots.select(F.col("host").alias("_rhost"), "rule", "allow")
    joined = cand.join(F.broadcast(r),
                       (F.col("host") == F.col("_rhost"))
                       & F.col("_path").startswith(F.col("rule")), "left")
    # longest matching rule per URL wins; no match -> allowed
    from pyspark.sql import Window
    w = (Window.partitionBy(*[F.col(c) for c in candidates.columns])
         .orderBy(F.desc(F.length("rule"))))
    ranked = joined.withColumn("_rn", F.row_number().over(w))
    return (ranked.filter(F.col("_rn") == 1)
            .withColumn("allowed", F.coalesce(F.col("allow"), F.lit(True)))
            .drop("_rn", "_rhost", "rule", "allow", "_path"))


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
