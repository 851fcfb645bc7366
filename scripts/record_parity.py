"""Record a full-registry parity artifact (PARITY_r{N}.json).

The driver's CORRECTNESS gate samples ~50 queries per round, so most of the
registry never gets a machine-readable per-round verdict. This script runs
EVERY registered query against its DuckDB oracle at sf0.01 through the same
``tests/oracle_harness.py::compare`` logic the local gate uses, and writes a
JSON file in the driver's CORRECTNESS format::

    {"<query>": {"rows_match": bool, "schema_match": bool, "hash_match": bool,
                 "spark_rows": int, "oracle_rows": int, "err": str | None}, ...}

Queries with no oracle (non-SQL-expressible) get the driver's weaker
rows-only record: ``{"rows_only": true, "spark_rows": N, "err": ...}``.

Usage::

    python scripts/record_parity.py [--out PARITY_r05.json] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r05.json")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None, help="comma-separated subset of query names")
    args = ap.parse_args()

    from metas_judiciarias_etl_spark import registry
    from metas_judiciarias_etl_spark.session import build_session
    from tests.oracle_harness import compare, duckdb_con, dtype_problems

    registry.load_all()
    spark = build_session(app_name="record-parity", shuffle_partitions=8)
    con = duckdb_con(args.sf)

    names = sorted(registry.QUERIES)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    out: dict[str, dict] = {}
    t0 = time.time()
    n_fail = 0
    for i, name in enumerate(names):
        rec: dict = {}
        try:
            df = registry.QUERIES[name](spark, args.sf)
            if name not in registry.ORACLES:
                rec = {"rows_only": True, "spark_rows": df.count(), "err": None}
            else:
                sql = registry.ORACLES[name]
                problems = compare(name, df, sql, con)
                problems += dtype_problems(name, df.schema, sql, con)
                o_rows = con.sql(f"SELECT count(*) FROM ({sql})").fetchone()[0]
                rec = {
                    "rows_match": not any("row count" in p for p in problems),
                    "schema_match": not any("columns differ" in p or "dtype class" in p for p in problems),
                    "hash_match": not any("values differ" in p or "vacuous" in p for p in problems),
                    "spark_rows": df.count(),
                    "oracle_rows": int(o_rows),
                    "err": "; ".join(problems) or None,
                }
        except Exception:
            rec = {"rows_match": False, "schema_match": False, "hash_match": False,
                   "spark_rows": None, "oracle_rows": None,
                   "err": traceback.format_exc(limit=3)}
        out[name] = rec
        if rec.get("err"):
            n_fail += 1
            print(f"[{i+1}/{len(names)}] FAIL {name}: {rec['err'][:200]}", flush=True)
        elif (i + 1) % 25 == 0:
            print(f"[{i+1}/{len(names)}] ... {time.time()-t0:.0f}s", flush=True)
        # The bench/cert drivers clear the cache between queries so 81
        # persist() sites can't accumulate across a 366-query sweep
        # (ADVICE r4): release everything this query pinned.
        spark.catalog.clearCache()

    meta = {
        "_meta": {
            "sf_dir": args.sf,
            "n_queries": len(names),
            "n_with_oracle": sum(1 for n in names if n in registry.ORACLES),
            "n_fail": n_fail,
            "elapsed_sec": round(time.time() - t0, 1),
        }
    }
    with open(args.out, "w") as f:
        json.dump({**meta, **out}, f, indent=1)
    print(f"wrote {args.out}: {len(names)} queries, {n_fail} failing, {time.time()-t0:.0f}s")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
