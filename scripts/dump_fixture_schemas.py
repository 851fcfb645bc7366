"""Dump the physical parquet schemas of the driver fixture tables.

The driver regenerates /root/testdata between rounds and has silently
changed physical types before (r1->r2: events.ts TIMESTAMP(MICROS) ->
TIMESTAMP(NANOS)), and dropped/added whole tables (r2->r3: partsupp
vanished). Run this FIRST each round, diff against the committed
snapshot (FIXTURE_SCHEMAS.txt), and extend normalization only in
sources/parquet.py::load_table.

Usage: python scripts/dump_fixture_schemas.py [> FIXTURE_SCHEMAS.txt]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

SF_DIRS = ("sf0.001", "sf0.01", "sf0.1")
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def main() -> None:
    for sf in SF_DIRS:
        d = os.path.join(ROOT, sf)
        if not os.path.isdir(d):
            print(f"{sf}: MISSING DIR")
            continue
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".parquet"):
                continue
            path = os.path.join(d, fname)
            f = pq.ParquetFile(path)
            arrow = f.schema_arrow
            cols = ", ".join(f"{n}:{arrow.field(n).type}" for n in arrow.names)
            print(f"{sf}/{fname} rows={f.metadata.num_rows} [{cols}]")


if __name__ == "__main__":
    sys.exit(main())
