#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only; the
engine itself is pure Scala/Spark). Reads Verify.scala's parquet dumps and
oracle_sql.json, runs each oracle in DuckDB against the same sf dir, and
compares row count, column names/dtypes, and exact sorted values.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, math, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(lambda v: str(v)))
    return df


def cmp_vals(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    # sequence cells (DuckDB lists arrive as python lists, Spark arrays as
    # numpy arrays) compare element-wise; dicts/sets must NOT take this
    # branch — list(dict) is keys-only and would pass differing values
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)) or \
            type(a).__name__ == "ndarray" or type(b).__name__ == "ndarray":
        # recurse per element: built-in list equality would miss NaN==NaN
        # inside array cells and raises on nested ndarrays (ambiguous
        # truthiness); both sides must be sequences of equal length
        try:
            la, lb = list(a), list(b)
        except TypeError:
            return False
        return len(la) == len(lb) and \
            all(cmp_vals(x, y) for x, y in zip(la, lb))
    if isinstance(a, dict) or isinstance(b, dict):
        return isinstance(a, dict) and isinstance(b, dict) and \
            sorted(a.items()) == sorted(b.items())
    return a == b or str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        errs = []
        if sorted(got.columns) != sorted(exp.columns):
            errs.append(f"columns: spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        elif len(got) != len(exp):
            errs.append(f"rows: spark={len(got)} duck={len(exp)}")
        else:
            # The driver's hash gate stringifies values, so dtype KIND
            # mismatches fail it (round-1 scalar_math_funcs: DOUBLE 1.0 vs
            # TINYINT 1) while width differences don't (int32 rank vs int64
            # passed). Fail here on kind mismatch only.
            def kind(dt):
                k = dt.kind  # i/u → int, f → float, else exact dtype
                return {"i": "int", "u": "int", "M": "datetime"}.get(k, str(dt))
            for c in sorted(got.columns):
                if kind(got[c].dtype) != kind(exp[c].dtype):
                    errs.append(
                        f"dtype {c}: spark={got[c].dtype} duck={exp[c].dtype}")
        if not errs and len(got) == len(exp) and \
                sorted(got.columns) == sorted(exp.columns):
            g, e = canon(got), canon(exp)
            for c in g.columns:
                bad = [i for i in range(len(g))
                       if not cmp_vals(g[c].iloc[i], e[c].iloc[i])]
                if bad:
                    i = bad[0]
                    errs.append(
                        f"col {c}: {len(bad)} diffs, first@{i}: "
                        f"spark={g[c].iloc[i]!r} duck={e[c].iloc[i]!r} "
                        f"(dtype {g[c].dtype} vs {e[c].dtype})")
        if errs:
            n_fail += 1
            print(f"FAIL {name}")
            for e2 in errs:
                print(f"     {e2}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
