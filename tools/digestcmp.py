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

Two evidence classes (BASELINE round-13: the q_hll_cube adjudication
event):

  * bit-identity — the default, and the only class without
    --partition-changing: every compared query must digest identically.
    This is the standing gate for same-partitioning perturbations
    (codegen off, Kryo, locale/timezone/charset, RocksDB, ...), where
    even the sketch queries are bit-stable.

  * error-bound only — sketch estimates (SKETCH_BOUNDED below) are
    partitioning-DEPENDENT in general: AQE's post-shuffle coalescing or
    a shuffle-partition sweep changes the partial-merge tree, and past
    the exact-coupon regime the estimate legitimately moves within its
    error contract (observed: q_hll_cube at sf0.1 under AQE-off, 1.58%
    vs the 5% gate). Under --partition-changing, a digest mismatch on
    one of these queries is NOT a failure: the tool instead checks the
    query's error bound and reports BOUNDED-EST (in-bounds) or DIVERGE
    (bound exceeded). A mismatch on any OTHER query stays DIVERGE —
    a real ML/relational divergence must never be misread as sketch
    noise, and an expected sketch move must never red the gate.

Usage:
  python3 tools/digestcmp.py DIR1 DIR2 [DIR3 ...] [--only q_a,q_b]
      [--partition-changing]
  python3 tools/digestcmp.py DIR --pin FILE [--only ...]     # write pins
  python3 tools/digestcmp.py DIR [...] --pinned FILE         # compare vs pins

Exit 0 iff every compared query is identical (or, with
--partition-changing, bounded) in all dirs. The compared set is the
UNION of all dirs' listings (a query missing from any dir digests to
ERR there and DIVERGEs). With --pinned, queries in the pin file also
join the compared set (a pinned query missing from a dir is a
DIVERGE); queries not in the pin file are compared across dirs only
and reported in a trailing count — on a single-dir run those are
printed as UNPINNED (nothing was compared), so the pin column is the
only real check there.
"""
import argparse
import hashlib
import os
import sys

import pyarrow.parquet as pq

# The sketch queries whose estimates may move under partition-changing
# configs, with the bound the tool enforces in --partition-changing mode:
#   q_hll_cube          — self-check: every row carries its exact sibling;
#                         |est-exact| <= 5% of exact (the HllSketchSpec
#                         gate; lgK=12 ~ 1.6% RSE, 5% is 3 sigma).
#   q_stream_hll        — no exact sibling in-row; cross-dir check: per
#                         day, the est spread across dirs <= 10% of the
#                         largest (two estimates each within 5% of the
#                         same truth differ by at most ~10%).
#   q_winsorized_approx — GK percentile bounds; `n` is exact and must be
#                         bit-equal; lo/hi/wmean cross-dir spread <= 5%
#                         (coarse sanity bound — CurationSpec holds the
#                         tight rank-error gate vs the exact twin).
SKETCH_BOUNDED = {"q_hll_cube", "q_stream_hll", "q_winsorized_approx"}


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


def _keyed(dirpath: str, q: str, key: str) -> dict:
    t = pq.read_table(os.path.join(dirpath, q))
    cols = t.column_names
    rows = list(zip(*[t.column(c).to_pylist() for c in cols]))
    ki = cols.index(key)
    out = {}
    for r in rows:
        out[r[ki]] = {c: r[i] for i, c in enumerate(cols)}
    return out


def bounded_check(dirs, q):
    """Return (ok, detail) enforcing q's error bound across dirs."""
    if q == "q_hll_cube":
        # The relational part of the query — the grouping key set and the
        # exact countDistinct sibling column — is partitioning-INDEPENDENT
        # and must be bit-equal across dirs; only est_users may move.
        # (ADVICE r14: without this, a missing row or a diverged exact
        # count would be misread as sketch noise and pass BOUNDED-EST.)
        per = [_keyed(d, q, "key") for d in dirs]
        keys = set(per[0])
        if any(set(p) != keys for p in per):
            return False, "key sets differ across dirs"
        for k in keys:
            if len({p[k]["exact_users"] for p in per}) != 1:
                return False, f"{k}: exact column exact_users differs across dirs"
        worst = 0.0
        for p, d in zip(per, dirs):
            for key, r in p.items():
                exact = max(r["exact_users"], 1)
                rel = abs(r["est_users"] - r["exact_users"]) / exact
                worst = max(worst, rel)
                if rel > 0.05:
                    return False, f"{d} {key}: rel err {rel:.4f} > 5%"
        return True, (f"keys+exact_users bit-equal across dirs; "
                      f"est within 5% of in-row exact (max {worst:.4f})")
    if q == "q_stream_hll":
        per = [_keyed(d, q, "day") for d in dirs]
        days = set(per[0])
        if any(set(p) != days for p in per):
            return False, "day sets differ across dirs"
        worst = 0.0
        for day in days:
            ests = [p[day]["est_users"] for p in per]
            spread = (max(ests) - min(ests)) / max(max(ests), 1)
            worst = max(worst, spread)
            if spread > 0.10:
                return False, f"{day}: est spread {spread:.4f} > 10%"
        return True, f"per-day est spread <= 10% (max {worst:.4f})"
    if q == "q_winsorized_approx":
        per = [_keyed(d, q, "event_type") for d in dirs]
        keys = set(per[0])
        if any(set(p) != keys for p in per):
            return False, "event_type sets differ across dirs"
        worst = 0.0
        for k in keys:
            if len({p[k]["n"] for p in per}) != 1:
                return False, f"{k}: exact column n differs across dirs"
            for c in ("lo", "hi", "wmean"):
                vs = [p[k][c] for p in per]
                den = max(abs(v) for v in vs) or 1.0
                spread = (max(vs) - min(vs)) / den
                worst = max(worst, spread)
                if spread > 0.05:
                    return False, f"{k}.{c}: spread {spread:.4f} > 5%"
        return True, f"n exact; lo/hi/wmean spread <= 5% (max {worst:.4f})"
    return False, f"no bounded check defined for {q}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+", help="two or more Verify output dirs")
    ap.add_argument("--only", help="comma-separated query subset")
    ap.add_argument(
        "--partition-changing", action="store_true",
        help="the compared configs change partitioning/merge topology "
             "(AQE, shuffle-partition sweeps): sketch queries are held "
             "to their error bound instead of bit-identity")
    ap.add_argument(
        "--pin", metavar="FILE",
        help="write the first dir's digests to FILE as JSON and exit; "
             "makes the cross-round bit-identity reference durable "
             "(the /tmp archives it previously relied on die with the "
             "session)")
    ap.add_argument(
        "--pinned", metavar="FILE",
        help="also compare against the digests pinned in FILE "
             "(bit-identity only: pins are produced under the default "
             "Verify config, so --partition-changing does not apply "
             "to the pin column)")
    args = ap.parse_args()
    if args.pin and args.pinned:
        # the pin-write path returns before the pin file would be loaded,
        # so mixing the flags silently produced no comparison at all
        # (ADVICE r18). Refuse, matching the other mutual-exclusion guards.
        ap.error("--pin writes pins and exits; it cannot be combined "
                 "with --pinned (run the compare separately)")
    if args.pin and args.partition_changing:
        # pins are bit-identity evidence produced under the default Verify
        # config; pinning from a partition-changing run would bake in
        # sketch digests (q_hll_cube etc.) that may later legitimately
        # move within their error bound and red a pinned gate (ADVICE
        # r18), mirroring the --pinned/--partition-changing refusal.
        ap.error("--pin records bit-identity references; it cannot be "
                 "combined with --partition-changing")
    if args.pin and len(args.dirs) > 1:
        # pins are by definition the digests of ONE dir; with multiple
        # dirs the compared set is the union of all listings, so a query
        # present only in a later dir would crash digest(base, q) with a
        # raw FileNotFoundError (ADVICE r17, reproduced). Refuse the mix
        # rather than silently pinning from base while the caller thinks
        # the other dirs participated.
        ap.error("--pin takes exactly one dir (pins are that dir's "
                 "digests; run the cross-dir compare separately)")
    if args.pinned and args.partition_changing:
        # pins are bit-identity under the default (partitioning-fixed)
        # Verify config; a partition-changing dir may legitimately differ
        # from the pin on sketch queries, which would force the bounded
        # path to silently forgive a pin mismatch. Refuse the mix.
        ap.error("--pinned is bit-identity evidence; it cannot be "
                 "combined with --partition-changing")
    base = args.dirs[0]
    # union the listings across ALL dirs (ADVICE r16): listing only the
    # first dir reproduced the pin-union bug class on the cross-dir path
    # — a query present in dir2+ but absent from dir1 (partial first run)
    # was silently dropped from the compared set. With the union, such a
    # query digests to ERR in the dir that lacks it and DIVERGEs.
    queries = sorted(set().union(*[
        {q for q in os.listdir(d)
         if q.startswith("q") and os.path.isdir(os.path.join(d, q))}
        for d in args.dirs]))
    # drop empty tokens (trailing comma / stray space in --only) so they
    # don't trip check_only_covered with a blank name (ADVICE r18).
    wanted = ({s.strip() for s in args.only.split(",") if s.strip()}
              if args.only else None)
    if args.only and not wanted:
        # an --only of ONLY empty tokens (e.g. --only ',') previously
        # degraded to no filter — an intended subset run silently became
        # a full compare (ADVICE r20). Refuse instead.
        ap.error(f"--only {args.only!r} contains no query names "
                 "(drop the flag to compare everything)")

    def check_only_covered(qs):
        # a typo'd --only entry must not shrink the run to a vacuous
        # "0 identical, 0 diverge" exit-0 (fresh-eyes audit, r18): every
        # requested query has to resolve to an output dir or a pin entry.
        missing = sorted(wanted - set(qs)) if wanted else []
        if missing:
            ap.error(f"--only names not found anywhere: {','.join(missing)}")

    if wanted is not None:
        queries = [q for q in queries if q in wanted]
    if args.pin:
        import json
        check_only_covered(queries)
        pins = {q: digest(base, q) for q in queries}
        with open(args.pin, "w") as f:
            json.dump(pins, f, indent=2, sort_keys=True)
            f.write("\n")
        print(f"pinned {len(pins)} digests from {base} -> {args.pin}")
        return 0
    pinned = {}
    if args.pinned:
        import json
        with open(args.pinned) as f:
            pinned = json.load(f)
        if not pinned:
            # an empty pin file is never intentional: on a single dir the
            # old behavior fell through to the misleading "need at least
            # two dirs" error (r19 audit note), and on multiple dirs the
            # pin column silently checked nothing while the caller
            # believed pins participated. Refuse it by name instead.
            ap.error(f"pin file {args.pinned} is empty — nothing to "
                     "compare against (re-run --pin, or drop --pinned)")
        # the pin is the authoritative query list: a query pinned but
        # absent from the compared dir (partial Verify run) must surface
        # as DIVERGE (digest() -> ERR), not be silently skipped — the
        # whole point of the pin is that the checked set cannot shrink.
        extra = sorted(set(pinned) - set(queries))
        if wanted is not None:
            extra = [q for q in extra if q in wanted]
        queries = sorted(set(queries) | set(extra))
    check_only_covered(queries)
    if len(args.dirs) < 2 and not pinned:
        ap.error("need at least two dirs (or --pinned FILE)")
    identical = bad = bounded = unpinned = 0
    for q in queries:
        # the pin column applies only to queries the pin file covers: an
        # unpinned query (e.g. the oracled 148 when comparing full dirs
        # against the 9-query adjudicated pin) is compared across dirs
        # only, rather than forced to DIVERGE on a phantom pin mismatch.
        # Resolved BEFORE the digest loop (ADVICE r17): on a single-dir
        # --pinned run an unpinned query is skipped entirely, not fully
        # digested (parquet read + sha256 over all values) and discarded.
        if pinned and q not in pinned:
            unpinned += 1
            if len(args.dirs) < 2:
                # single dir + no pin entry: nothing was compared at all
                # (ADVICE r16: printing IDENTICAL here invited misreading
                # a no-op as evidence). Honest marker, excluded from the
                # identical count.
                print(f"UNPINNED    {q} (single dir, no pin entry -- "
                      "not compared)")
                continue
        ds = {}
        for d in args.dirs:
            try:
                ds[d] = digest(d, q)
            except Exception as e:  # missing output in one dir is a diff
                ds[d] = f"ERR:{e}"
        if pinned and q in pinned:
            ds[f"pin:{args.pinned}"] = pinned[q]
        if len(set(ds.values())) == 1:
            identical += 1
            print(f"IDENTICAL   {q}")
        elif args.partition_changing and q in SKETCH_BOUNDED:
            try:
                ok, detail = bounded_check(args.dirs, q)
            except Exception as e:
                ok, detail = False, f"bound check failed: {e}"
            if ok:
                bounded += 1
                print(f"BOUNDED-EST {q} ({detail})")
            else:
                bad += 1
                print(f"DIVERGE     {q} bound exceeded: {detail} {ds}")
        else:
            bad += 1
            print(f"DIVERGE     {q} {ds}")
    note = f", {unpinned} without a pin entry" if unpinned else ""
    print(f"== {identical} identical, "
          f"{bounded} bounded-estimate, {bad} diverge{note} ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
