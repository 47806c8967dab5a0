#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views
over <sfDir>/*.parquet, and compares: columns sorted by name, rows sorted
by all columns, exact value equality. Dev-only tooling (the real gate is
driver-side); NOT part of the shipped library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def kind(dtype):
    """Collapse a pandas dtype to a comparison class. The driver's hash
    is type-strict, so DuckDB HUGEINT (object) vs Spark BIGINT (int64)
    must FAIL locally even when pandas value equality would pass
    (round-13 b5 escaped this way; round-12 w10 was the same class)."""
    k = dtype.kind  # i/u int, f float, b bool, O object, M datetime, ...
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def dtype_mismatches(odf, sdf):
    """Per-column dtype-kind differences, with DuckDB's HUGEINT (which
    pandas surfaces as object-of-int) called out as int vs what Spark
    wrote. Empty columns are skipped (no values to classify)."""
    bad = []
    for c in odf.columns:
        ok, sk = kind(odf[c].dtype), kind(sdf[c].dtype)
        # A HUGEINT column arrives as object dtype holding python ints;
        # classify by the first non-null value so the report is precise.
        if ok == "object" and len(odf) and isinstance(
                odf[c].dropna().iloc[0] if odf[c].notna().any() else None, int):
            ok = "int(object/HUGEINT)"
        if sk == "object" and len(sdf) and isinstance(
                sdf[c].dropna().iloc[0] if sdf[c].notna().any() else None, int):
            sk = "int(object)"
        if ok != sk:
            bad.append((c, ok, sk))
    return bad


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        pdir = Path(out_dir) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sdf = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns differ: oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        odf, sdf = odf[ocols], sdf[scols]
        dt_bad = dtype_mismatches(odf, sdf)
        if dt_bad:
            print(f"FAIL {name}: dtype kind differs (driver hash is "
                  f"type-strict): " +
                  "; ".join(f"{c}: oracle={o} spark={s}" for c, o, s in dt_bad))
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows differ: oracle={len(odf)} spark={len(sdf)}")
            n_fail += 1
            continue
        orows = sorted([tuple(norm(v) for v in r) for r in odf.itertuples(index=False)], key=repr)
        srows = sorted([tuple(norm(v) for v in r) for r in sdf.itertuples(index=False)], key=repr)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first at {i}:")
            print(f"  oracle: {a}")
            print(f"  spark : {b}")
            # show per-column dtypes to debug type mismatches
            print(f"  dtypes oracle={dict(odf.dtypes.astype(str))}")
            print(f"  dtypes spark ={dict(sdf.dtypes.astype(str))}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
