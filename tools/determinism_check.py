#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query-by-query.

Usage: determinism_check.py <outDirA> <outDirB> [skip,names,csv]

The round-close determinism battery runs Verify twice at sf0.001 with
SPARK_GRAFT_CPUS=2 and =16 and feeds both dirs here: every query must be
BYTE-identical across parallelism (the hash engine's partition-invariance
contract). PRNG queries (q_random_engine) are skipped by default — their
contract is per-row randomness, not cross-run stability.
"""
import sys, os
import pandas as pd

SKIP_DEFAULT = {"q_random_engine"}


def load(d, name):
    df = pd.read_parquet(os.path.join(d, name))
    # order-insensitive: Verify writes deterministic content, but shuffle
    # partition count can permute row order for un-sorted queries
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    a, b = sys.argv[1], sys.argv[2]
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else SKIP_DEFAULT
    names = sorted(n for n in os.listdir(a)
                   if os.path.isdir(os.path.join(a, n)) and not n.startswith("_"))
    other = sorted(n for n in os.listdir(b)
                   if os.path.isdir(os.path.join(b, n)) and not n.startswith("_"))
    if names != other:
        print(f"DIFFER: query sets differ: {set(names) ^ set(other)}")
        sys.exit(1)
    bad = []
    for n in names:
        if n in skip:
            continue
        try:
            da, db = load(a, n), load(b, n)
            if list(da.columns) != list(db.columns):
                bad.append((n, "schema"))
            elif not da.equals(db):
                bad.append((n, f"values ({len(da)} vs {len(db)} rows)"))
        except Exception as e:
            bad.append((n, f"error {e}"))
    checked = len([n for n in names if n not in skip])
    if bad:
        print(f"DIFFER ({len(bad)}/{checked}): " +
              " ".join(f"{n}[{why}]" for n, why in bad))
        sys.exit(1)
    print(f"IDENTICAL ({checked} queries, {len(skip & set(names))} skipped)")


if __name__ == "__main__":
    main()
