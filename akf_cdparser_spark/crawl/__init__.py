"""Crawl frontier engine (BASELINE.json north_rule): URL canonicalization +
64-bit hashing, partitioned bloom/cuckoo URL-seen set, per-host politeness
priority queue via salted repartition-by-host-hash, robots gating, generation
loop with checkpoint/resume, per-partition lineage + metrics."""
