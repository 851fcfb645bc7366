"""Deterministic K× upsample of a driver fixture dir, for scale-curve runs.

Produces a larger dataset with the SAME schemas and (crucially) the same
*per-row statistical character* as the source fixture, so wall-time ratios
between the two sizes measure the ENGINE's scaling, not a distribution
shift:

* fact/dim tables (customer, supplier, part, orders, lineitem, events)
  are replicated K times with surrogate-key OFFSETS (replica r adds
  r * (max_key + 1) to every key and FK), so referential integrity holds
  and distinct-key cardinalities scale linearly — the TPC-H SF contract;
* ``region``/``nation`` stay fixed (TPC-H semantics: geography is
  constant at every SF);
* ``documents.text`` is Caesar-shifted by r per replica (letters only):
  length, whitespace, token boundaries, punctuation — every per-row cost
  driver — is byte-for-byte preserved, while shingle/minhash content
  becomes disjoint across replicas. Near-dup STRUCTURE therefore scales
  linearly (each replica contains the original's dup clusters, no
  cross-replica accidental near-dups), which is the honest model of "10×
  more data at the same dup rate". Plain replication would instead make
  every doc a 10-way exact dup — a different corpus, quadratic pair
  output, and a useless timing signal (that dup-heavy probe already
  exists in SCALE.md round 5);
* ``embeddings.embedding`` is dimension-ROTATED by (r*7) % dim per
  replica: norms and all within-replica cosines are bit-preserved, while
  cross-replica cosines collapse to noise — same rationale as the text
  shift.

Replica 0 is the source data verbatim, so sf_src ⊂ sf_out row-wise.

Usage:
    python scripts/make_scale_fixture.py \
        --src /root/testdata/sf0.1 --out bench_out/sf1 --factor 10

Writes one parquet per table; output dir lives under the untracked
bench_out/ by default (a ~200 MB fixture does not belong in git).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# key column -> table that OWNS it (offset base = that table's max+1)
KEY_OWNER = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "event_id": "events",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

# table -> {column: key_name} to offset per replica
OFFSET_COLS = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def _caesar_tables(shift: int) -> dict[int, int]:
    lo = "abcdefghijklmnopqrstuvwxyz"
    hi = lo.upper()
    s = shift % 26
    return str.maketrans(lo + hi, lo[s:] + lo[:s] + hi[s:] + hi[:s])


def _shift_text(col: pa.ChunkedArray, shift: int) -> pa.Array:
    tbl = _caesar_tables(shift)
    return pa.array(
        [None if v is None else v.translate(tbl) for v in col.to_pylist()],
        type=pa.string(),
    )


def _rotate_embeddings(col: pa.ChunkedArray, rot: int) -> pa.Array:
    rows = col.to_pylist()
    out = []
    for v in rows:
        if v is None:
            out.append(None)
            continue
        r = rot % len(v)
        out.append(v[r:] + v[:r])
    return pa.array(out, type=col.type)


def upsample(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in TABLES}
    bases = {
        key: pc.max(tables[owner][key]).as_py() + 1
        for key, owner in KEY_OWNER.items()
    }

    for name, tbl in tables.items():
        if name in ("region", "nation"):
            pq.write_table(tbl, os.path.join(out, f"{name}.parquet"))
            print(f"{name}: copied {tbl.num_rows} rows")
            continue
        replicas = []
        for r in range(factor):
            rep = tbl
            if r > 0:
                for col, key in OFFSET_COLS.get(name, {}).items():
                    idx = rep.schema.get_field_index(col)
                    shifted = pc.add(
                        rep[col], pa.scalar(r * bases[key], type=rep[col].type)
                    )
                    rep = rep.set_column(idx, rep.schema.field(idx), shifted)
            if name == "documents" and r > 0:
                idx = rep.schema.get_field_index("text")
                rep = rep.set_column(
                    idx, rep.schema.field(idx), _shift_text(rep["text"], r)
                )
            if name == "embeddings" and r > 0:
                idx = rep.schema.get_field_index("embedding")
                rep = rep.set_column(
                    idx, rep.schema.field(idx),
                    _rotate_embeddings(rep["embedding"], r * 7),
                )
            replicas.append(rep)
        big = pa.concat_tables(replicas)
        pq.write_table(big, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="bench_out/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    upsample(args.src, args.out, args.factor)


if __name__ == "__main__":
    main()
