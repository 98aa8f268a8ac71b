#!/usr/bin/env python
"""Emit CORRECTNESS_LOCAL_r{N}.json — the FULL-registry correctness
artifact (VERDICT r5 #2).

The round driver's gate (CORRECTNESS_r{N}.json) caps at the first 50
registry entries, leaving q51+ — every §2.4 value oracle and the whole
LLM-data plane — invisible without a 13-minute pytest run. This script
runs the SAME Spark-vs-DuckDB comparison (plans/oracle_check.compare,
the code tests/test_oracle_parity.py uses) over EVERY registry entry and
serializes per-query verdicts in the driver's format:

    {"qNN_name": {"rows_match": bool, "schema_match": bool,
                  "hash_match": bool, "spark_rows": int,
                  "oracle_rows": int, "err": null | str}, ...}

Usage:
    PYTHONPATH=. python scripts/correctness_local.py [round_number]
Writes CORRECTNESS_LOCAL_r{NN}.json at the repo root (default round from
the latest CORRECTNESS_r*.json present, +1).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def infer_round() -> int:
    rounds = [int(m.group(1)) for p in glob.glob(f"{REPO}/CORRECTNESS_r*.json")
              if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


def main() -> int:
    sys.path.insert(0, REPO)
    from akf_cdparser_spark.plans.oracle_check import (compare,
                                                       duck_connection)
    from akf_cdparser_spark.plans.queries import REGISTRY
    from akf_cdparser_spark.session import get_spark

    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else infer_round()
    spark = get_spark(app_name="correctness_local", master="local[8]")
    con = duck_connection(SF_DIR)

    out: dict[str, dict] = {}
    failures = 0
    for name, (fn, sql) in REGISTRY.items():
        try:
            res = compare(name, fn(spark, SF_DIR), sql, con)
            ok = bool(res.get("ok"))
            rows_match = (res.get("status") == "ROWS_ONLY"
                          or res.get("spark_rows") == res.get("oracle_rows"))
            schema_match = res.get("status") not in ("SCHEMA_MISMATCH",)
            entry = {
                "rows_match": bool(rows_match),
                "schema_match": bool(schema_match),
                "hash_match": ok and res.get("status") == "MATCH",
                "spark_rows": int(res.get("spark_rows", -1)),
                "oracle_rows": int(res.get("oracle_rows", -1))
                if "oracle_rows" in res else None,
                "err": None if ok else res.get(
                    "detail", res.get("status")),
            }
            if res.get("status") == "ROWS_ONLY":
                entry["hash_match"] = None       # weaker rows-only check
                entry["note"] = "ROWS_ONLY (no oracle_sql for this op)"
        except Exception as exc:  # never abort the sweep on one query
            entry = {"rows_match": False, "schema_match": False,
                     "hash_match": False, "spark_rows": -1,
                     "oracle_rows": None,
                     "err": f"{type(exc).__name__}: {exc}"}
        if entry["err"] is not None or entry["hash_match"] is False:
            failures += 1
        out[name] = entry
        state = ("ok" if entry["err"] is None and entry["hash_match"]
                 else "ROWS_ONLY" if entry.get("note") else "FAIL")
        print(f"{state:9s} {name}", flush=True)

    path = os.path.join(REPO, f"CORRECTNESS_LOCAL_r{rnd:02d}.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: {len(out)} queries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
