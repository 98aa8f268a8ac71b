"""Sequential single-threaded crawl oracle.

Implements the SAME scheduling semantics as frontier.CrawlEngine with plain
Python data structures (a per-generation sort standing in for the priority
queue). The engine's fetch_log and seen set must match this byte-for-byte at
every parallelism level — that is the north rule's exactness criterion.
"""

from __future__ import annotations

from .. import fixtures
from ..kernel import parse_document
from .canonicalize import canonicalize_url, hash64_py
from .robots import robots_allowed_py


def _host(url: str) -> str:
    import re
    m = re.match(r"^([a-z0-9+.\-]+://[^/]+)", url)
    return m.group(1) if m else ""


def crawl_oracle(n_docs: int, seeds: list[dict], robots_rules: list[dict],
                 host_budget, generations: int,
                 initial_seen: dict | None = None,
                 host_budgets: dict | None = None) -> dict:
    """Returns {"fetch_log": [(seq, url_hash, url, doc_id, gen)],
    "seen": {url_hash: url}}.

    ``host_budget`` is an int, or a callable ``gen -> int`` for runs whose
    politeness budget changes mid-crawl (the engine's budget-change-resume
    contract is oracled against this).

    ``initial_seen`` ({url_hash: url}) pre-populates the seen set — the
    recrawl-EPOCH mirror of ``CrawlEngine.bootstrap(seen=...)``: a new
    epoch starts from the previous epoch's seen set minus the stale URLs
    being refetched.

    ``host_budgets`` ({host: budget}) is the Crawl-delay plane
    (``frontier.crawl_delay_budgets``): a listed host schedules at most
    ``min(global budget, its budget)`` URLs per generation."""
    budget_for = host_budget if callable(host_budget) else (
        lambda _gen: host_budget)
    name_index: dict[str, str] = {}
    for i in range(n_docs):
        name = fixtures.company_name(i)
        name_index.setdefault(name, fixtures.url_for(i))

    frontier: dict[int, tuple] = {}  # url_hash -> (url, host, nft, depth)
    seen: dict[int, str] = dict(initial_seen or {})
    fetch_log: list[tuple] = []

    def add(url: str, nft: int, depth: int):
        url = canonicalize_url(url)
        h = hash64_py(url)
        cur = frontier.get(h)
        entry = (url, _host(url), nft, depth)
        if cur is None:
            frontier[h] = entry
        else:
            # deterministic reduce: min url / host / nft / depth
            frontier[h] = (min(cur[0], url), min(cur[1], _host(url)),
                           min(cur[2], nft), min(cur[3], depth))

    for s in seeds:
        add(s["url"], 0, 0)

    seq = 0
    for gen in range(1, generations + 1):
        candidates = [(h, *v) for h, v in frontier.items() if h not in seen]
        allowed, disallowed = [], []
        for h, url, host, nft, depth in candidates:
            (allowed if robots_allowed_py(url, robots_rules)
             else disallowed).append((h, url, host, nft, depth))

        # per-host politeness top-k in (nft, url_hash, url) order
        by_host: dict[str, list] = {}
        for item in allowed:
            by_host.setdefault(item[2], []).append(item)
        scheduled = []
        for host, items in by_host.items():
            items.sort(key=lambda x: (x[3], x[0], x[1]))
            b = budget_for(gen)
            if host_budgets and host in host_budgets:
                b = min(b, host_budgets[host])
            scheduled.extend(items[:b])
        # global crawl order
        scheduled.sort(key=lambda x: (x[3], x[0], x[1]))

        if not scheduled:
            break

        for h, url, host, nft, depth in scheduled:
            i = fixtures.doc_index_from_url(url)
            doc_id = fixtures.doc_id_for(i) if i is not None and i < n_docs else None
            fetch_log.append((seq, h, url, doc_id, gen))
            seq += 1
            seen[h] = url
            if doc_id is not None:
                record, _, _ = parse_document(fixtures.synth_html(i, n_docs))
                for group in record.get("beteiligungen") or []:
                    for zeile in group.get("zeilen") or []:
                        if isinstance(zeile, dict):
                            target = name_index.get(
                                (zeile.get("beteiliger") or "").strip())
                            if target and hash64_py(canonicalize_url(target)) not in seen:
                                add(target, gen, gen)
        for h, url, host, nft, depth in disallowed:
            seen[h] = url
        for h, *_ in scheduled:
            frontier.pop(h, None)
        for h, url, host, nft, depth in disallowed:
            frontier.pop(h, None)

    return {"fetch_log": fetch_log, "seen": seen}
