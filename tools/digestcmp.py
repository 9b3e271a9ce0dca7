#!/usr/bin/env python3
"""Compare Verify output dirs by canonical full-value digest.

Dev-side companion to localcheck.py for the queries the DuckDB oracle
cannot hash-check (the adjudicated set): given two or more Verify
output directories (same SF), it digests each query's parquet output
canonically — columns sorted by name, rows sorted by their full value
tuple, sha256 over every value — and reports whether all dirs agree.

Used for cross-config invariance evidence (BASELINE round-12
session-6): a query whose digest is identical across perturbed
physical/JVM configs is pinned even without a SQL oracle.

Usage:
  python3 tools/digestcmp.py DIR1 DIR2 [DIR3 ...] [--only q_a,q_b]

Exit 0 iff every compared query is identical in all dirs.
"""
import argparse
import hashlib
import os
import sys

import pyarrow.parquet as pq


def digest(dirpath: str, q: str) -> str:
    t = pq.read_table(os.path.join(dirpath, q))
    cols = sorted(t.column_names)
    rows = list(zip(*[t.column(c).to_pylist() for c in cols])) if cols else []
    # repr is value-faithful for the types in play (ints, floats incl.
    # -0.0/nan distinctions, strings, bytes, lists, None)
    rows.sort(key=repr)
    h = hashlib.sha256(repr(cols).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+", help="two or more Verify output dirs")
    ap.add_argument("--only", help="comma-separated query subset")
    args = ap.parse_args()
    if len(args.dirs) < 2:
        ap.error("need at least two dirs")
    base = args.dirs[0]
    queries = sorted(
        d for d in os.listdir(base)
        if d.startswith("q") and os.path.isdir(os.path.join(base, d)))
    if args.only:
        wanted = set(args.only.split(","))
        queries = [q for q in queries if q in wanted]
    bad = 0
    for q in queries:
        ds = {}
        for d in args.dirs:
            try:
                ds[d] = digest(d, q)
            except Exception as e:  # missing output in one dir is a diff
                ds[d] = f"ERR:{e}"
        if len(set(ds.values())) == 1:
            print(f"IDENTICAL {q}")
        else:
            bad += 1
            print(f"DIVERGE   {q} {ds}")
    print(f"== {len(queries) - bad} identical, {bad} diverge ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
