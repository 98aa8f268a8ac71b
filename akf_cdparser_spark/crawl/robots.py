"""robots.txt gating: a small rules table broadcast-joined against candidate
URLs, most-specific matching rule wins (RFC 9309 semantics).

The rules table is tiny (one row per host × path rule) — classic broadcast
dimension; the candidate side streams, no shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex metacharacters escaped when translating a robots rule into a
# match pattern. '*' is deliberately NOT in the set (it becomes '.*'); '$'
# IS escaped first and the trailing one is un-escaped back into an anchor.
_JAVA_META = r"([.^$+?(){}\[\]|\\])"


def _rule_pattern_col() -> "F.Column":
    """RFC 9309 rule -> anchored Java-regex pattern, as a Column over
    ``rule``: metachars escaped, every ``*`` -> ``.*``, a TRAILING ``$``
    -> end anchor (a ``$`` anywhere else is a literal octet, per the RFC's
    'the $ designates the end of the match pattern')."""
    esc = F.regexp_replace(F.col("rule"), _JAVA_META, r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    # replacement-side '$' must itself be escaped (Java group-ref marker)
    anchored = F.when(F.col("rule").endswith("$"),
                      F.regexp_replace(esc, r"\\\$$", r"\$")).otherwise(esc)
    return F.concat(F.lit("^"), anchored)


def apply_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """candidates(url, host, ...) x robots(host, rule, allow) -> candidates
    with ``allowed`` per most-specific rule; hosts with no rules default to
    allowed.

    Matching implements RFC 9309 path patterns: plain rules are prefix
    matches (JVM ``startswith`` fast path — no regex on the hot path),
    rules containing ``*``/``$`` match via a pattern precomputed ONCE per
    rule at broadcast-build time (the per-URL lambda only executes it).
    Precedence is rule-string length in octets, wildcards counted as
    written (the RFC's 'most specific = longest' reading, as deployed by
    the major crawlers); allow wins length ties.

    Window-free plan: rules are aggregated per host into an array,
    broadcast, and the most specific matching rule is picked with a single
    JVM-side ``aggregate`` over that (tiny) array — one broadcast join, no
    shuffle, no per-URL row_number."""
    path = F.regexp_replace(F.col("url"), r"^[a-z0-9+.\-]+://[^/]*", "")
    per_host = (robots
                .withColumn("_wild", F.col("rule").rlike(r"[*$]"))
                .withColumn("_pat", _rule_pattern_col())
                .groupBy("host")
                .agg(F.collect_list(
                    F.struct("rule", "allow", "_wild", "_pat"))
                    .alias("_rules"))
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
            F.when(r._wild, F.rlike(F.col("_path"), r._pat))
            .otherwise(F.col("_path").startswith(r.rule))
            & ((F.length(r.rule) > acc.rlen)
               | ((F.length(r.rule) == acc.rlen) & r.allow & ~acc.allow)),
            F.struct(F.length(r.rule).alias("rlen"), r.allow.alias("allow"))
        ).otherwise(acc))
    return (cand.withColumn("allowed", best.allow)
            .drop("_rhost", "_rules", "_path"))


def _rule_match_py(path: str, rule: str) -> bool:
    """Pure-Python twin of the per-rule match (prefix fast path, RFC 9309
    ``*``/``$`` translation otherwise — same trailing-$-only anchoring)."""
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)
    parts = []
    for i, ch in enumerate(rule):
        if ch == "*":
            parts.append(".*")
        elif ch == "$" and i == len(rule) - 1:
            parts.append("$")
        else:
            parts.append(re.escape(ch))
    return re.match("".join(parts), path) is not None


def robots_allowed_py(url: str, rules: list[dict]) -> bool:
    """Pure-Python twin for the sequential oracle (same most-specific +
    allow-wins-tie semantics as ``apply_robots`` — tie-break is
    order-independent in both, wildcard matching identical)."""
    host_m = re.match(r"^([a-z0-9+.\-]+://[^/]+)", url)
    host = host_m.group(1) if host_m else ""
    path = url[len(host):]
    best = None
    for r in rules:
        if r["host"] == host and _rule_match_py(path, r["rule"]):
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
    rule emitted). ``*``/``$`` path wildcards pass through verbatim and are
    interpreted by ``apply_robots``/``robots_allowed_py`` (RFC 9309
    matching). ``Crawl-delay`` of the selected group is surfaced by
    ``parse_crawl_delay`` and maps onto the budget-based politeness plane
    via ``frontier.crawl_delay_budgets``. NOT implemented (documented
    cut): Sitemap lines are ignored.
    """
    _, best_dirs, _ = _select_group(text, user_agent)
    return [{"host": host, "rule": rule, "allow": allow}
            for rule, allow in best_dirs]


def parse_crawl_delay(host: str, text: str,
                      user_agent: str = "*") -> list[dict]:
    """``Crawl-delay`` seconds of the robots.txt group that applies to
    ``user_agent`` (same group selection as ``parse_robots_txt``), as
    ``[{host, crawl_delay}]`` rows for ``frontier.crawl_delay_budgets`` —
    empty if the group sets none or the value is not a positive number.
    The last Crawl-delay line in the group wins (the common crawler
    behavior for repeated directives)."""
    _, _, delay = _select_group(text, user_agent)
    if delay is None or delay <= 0:
        return []
    return [{"host": host, "crawl_delay": delay}]


def _select_group(text: str, user_agent: str):
    """Group selection shared by rules and crawl-delay extraction: returns
    (agents, directives, crawl_delay) of the longest-UA-token group."""
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    agents: list[str] = []
    directives: list[tuple[str, bool]] = []
    delay: float | None = None
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
                groups.append((agents, directives, delay))
                agents, directives, delay = [], [], None
                in_group_body = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                directives.append((val, key == "allow"))
            # empty Disallow == allow everything: no rule (default allows)
        elif key == "crawl-delay":
            in_group_body = True
            try:
                delay = float(val)
            except ValueError:
                pass
    if agents or directives or delay is not None:
        groups.append((agents, directives, delay))

    ua = user_agent.lower()
    best_key: tuple[int, int] | None = None
    best: tuple = ([], [], None)
    for group in groups:
        for tok in group[0]:
            if tok == "*":
                key = (0, 0)
            elif tok in ua:
                key = (1, len(tok))
            else:
                continue
            if best_key is None or key > best_key:
                best_key, best = key, group
    return best
