#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> [sf_dir]

Reads every <name>/ parquet result written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same fixture parquet,
and compares row count, column names (sorted), and cell values.
Mirrors SURVEY.md §5.2; the real driver does the same at sf0.01.
"""
import datetime
import decimal
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        # report near-misses distinctly: driver hashing would fail these
        return False
    return a == b


def pandas_audit(name, out_dir, con, sql):
    """Reproduce the driver's compare path: spark result via
    pandas.read_parquet (pyarrow), oracle via duckdb .df(). The driver
    sorts rows by every column then hashes stringified values, so these
    are hard failures even when python-level == passes:
      - array/map cells (pandas lexsort crashes on ndarray)
      - Decimal objects (parquet decimal -> Decimal('1.50'),
        duckdb decimal -> float 1.5: different strings)
      - datetime.date vs Timestamp (parquet date32 -> date object,
        duckdb DATE -> datetime64: '2024-01-05' vs '2024-01-05 00:00:00')
      - dtype-kind mismatch int vs float ('3' vs '3.0', HUGEINT trap)
    Returns list of problem strings (empty = clean)."""
    bad = []
    try:
        sdf = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        return [f"spark parquet unreadable via pandas: {e}"]
    odf = con.execute(sql).df()
    for side, df in (("spark", sdf), ("duckdb", odf)):
        for c in df.columns:
            if df[c].dtype == object and len(df):
                # probe the first NON-null value: a column whose first row
                # is None but holds Decimal/array/date cells later would
                # escape the hazard check (ADVICE r4)
                nn = df[c].dropna()
                v = nn.iloc[0] if len(nn) else None
                if isinstance(v, (np.ndarray, list, dict)):
                    bad.append(f"{side}.{c}: array/map cell "
                               f"({type(v).__name__}) — driver sort crash")
                elif isinstance(v, decimal.Decimal):
                    bad.append(f"{side}.{c}: Decimal cell — "
                               "cross-render mismatch")
                elif isinstance(v, datetime.date) and \
                        not isinstance(v, datetime.datetime):
                    bad.append(f"{side}.{c}: raw date cell — renders "
                               "differently per engine path")
            if str(df[c].dtype) == "float32":
                bad.append(f"{side}.{c}: float32 — repr differs from f64")
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
        if ks != ko and {ks, ko} != {"O"} and not (
                {ks, ko} <= {"i", "u"}) and "M" not in (ks, ko):
            bad.append(f"{c}: dtype kind spark={sdf[c].dtype} "
                       f"duckdb={odf[c].dtype} — stringified hash differs")
    return bad


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_noracle = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        got_cols = [d[0] for d in got_rel.description]
        got_types = {d[0]: str(d[1]) for d in got_rel.description}
        got = got_rel.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  [no-oracle] {name}: rows={len(got)}"
                  + ("  ** EMPTY **" if len(got) == 0 else ""))
            continue
        try:
            exp_rel = con.execute(oracle[name])
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            continue
        # dtype audit: python == is laxer than a dtype-aware hash would be
        e_t = {d[0]: str(d[1]) for d in exp_rel.description}
        diff = {c: (got_types[c], e_t[c]) for c in got_types
                if c in e_t and got_types[c] != e_t[c]}
        if diff:
            print(f"  [type-warn] {name}: {diff}")
        if sorted(got_cols) != sorted(exp_cols):
            n_fail += 1
            print(f"  [FAIL] {name}: cols spark={sorted(got_cols)} "
                  f"duckdb={sorted(exp_cols)}")
            continue
        if len(got) != len(exp):
            n_fail += 1
            print(f"  [FAIL] {name}: rows spark={len(got)} duckdb={len(exp)}")
            continue
        # driver sorts columns by name before hashing values
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        bad = None
        for r, (g, e) in enumerate(zip(got, exp)):
            for k in range(len(gi)):
                if not cmp_cell(g[gi[k]], e[ei[k]]):
                    bad = (r, sorted(got_cols)[k], g[gi[k]], e[ei[k]])
                    break
            if bad:
                break
        if bad:
            n_fail += 1
            print(f"  [FAIL] {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} duckdb={bad[3]!r}")
            continue
        probs = pandas_audit(name, out_dir, con, oracle[name])
        if probs:
            n_fail += 1
            print(f"  [FAIL] {name}: driver-compare hazards:")
            for p in probs:
                print(f"         {p}")
        else:
            n_pass += 1
            print(f"  [pass] {name}: {len(got)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only "
          f"(of {len(names)})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
