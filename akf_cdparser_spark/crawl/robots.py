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
    # tie-break MUST be order-independent: collect_list order is
    # nondeterministic, so "first rule wins on equal length" would let two
    # equal-length conflicting rules flip allowed between runs (and diverge
    # from the sequential oracle). REP semantics — allow wins the tie — is
    # deterministic for any arrival order; robots_allowed_py mirrors it.
    best = F.aggregate(
        F.coalesce(F.col("_rules"), F.array()),
        F.struct(F.lit(-1).alias("rlen"), F.lit(True).alias("allow")),
        lambda acc, r: F.when(
            F.col("_path").startswith(r.rule)
            & ((F.length(r.rule) > acc.rlen)
               | ((F.length(r.rule) == acc.rlen) & r.allow & ~acc.allow)),
            F.struct(F.length(r.rule).alias("rlen"), r.allow.alias("allow"))
        ).otherwise(acc))
    return (cand.withColumn("allowed", best.allow)
            .drop("_rhost", "_rules", "_path"))


def robots_allowed_py(url: str, rules: list[dict]) -> bool:
    """Pure-Python twin for the sequential oracle (same longest-prefix +
    allow-wins-tie semantics as ``apply_robots`` — tie-break is
    order-independent in both)."""
    import re
    host_m = re.match(r"^([a-z0-9+.\-]+://[^/]+)", url)
    host = host_m.group(1) if host_m else ""
    path = url[len(host):]
    best = None
    for r in rules:
        if r["host"] == host and path.startswith(r["rule"]):
            if (best is None or len(r["rule"]) > len(best["rule"])
                    or (len(r["rule"]) == len(best["rule"])
                        and r["allow"] and not best["allow"])):
                best = r
    return best["allow"] if best else True


def parse_robots_txt(host: str, text: str, user_agent: str = "*") -> list[dict]:
    """Parse a standard robots.txt body into the rules-table rows
    ``apply_robots`` consumes: ``{host, rule, allow}`` per Allow/Disallow
    line of the group that applies to ``user_agent``.

    Robots-Exclusion-Protocol subset implemented: ``#`` comments, blank-line
    group separation, case-insensitive directive names, multiple
    ``User-agent`` lines heading one group, group selection by the LONGEST
    user-agent token that is a case-insensitive substring of ``user_agent``
    (``*`` is the weakest match), empty ``Disallow:`` meaning allow-all (no
    rule emitted). NOT implemented (documented cut): ``*``/``$`` path
    wildcards and Sitemap lines are ignored; ``Crawl-delay`` is ignored
    because politeness here is budget-based (host_budget), not delay-based.
    """
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    directives: list[tuple[str, bool]] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((agents, directives))
                agents, directives = [], []
                in_group_body = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                directives.append((val, key == "allow"))
            # empty Disallow == allow everything: no rule (default allows)
    if agents or directives:
        groups.append((agents, directives))

    ua = user_agent.lower()
    best_key: tuple[int, int] | None = None
    best_dirs: list[tuple[str, bool]] = []
    for agents, directives in groups:
        for tok in agents:
            if tok == "*":
                key = (0, 0)
            elif tok in ua:
                key = (1, len(tok))
            else:
                continue
            if best_key is None or key > best_key:
                best_key, best_dirs = key, directives
    return [{"host": host, "rule": rule, "allow": allow}
            for rule, allow in best_dirs]
