#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each <outDir>/<name> parquet directory, executes the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
parquet tables, and compares (rows, schema-names, values).

Compare semantics (conservative superset of the driver's): sort
columns by name, sort rows by all values, exact equality except
floats (compared to 1e-9 relative, then flagged if not bit-equal
so we can chase exactness).

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def load_spark_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl


def canon(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    cnames = [names[i] for i in order]
    crows = [tuple(r[i] for i in order) for r in rows]
    crows.sort(key=lambda r: tuple(
        (x is None, str(type(x)), str(x)) for x in r))
    return cnames, crows


def norm(x):
    if x is None:
        return None
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return x
    if isinstance(x, (list, tuple)):
        return tuple(norm(v) for v in x)
    # timestamps: compare on isoformat
    if hasattr(x, "isoformat"):
        return x.isoformat()
    return x


def vals_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(vals_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def bit_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(bit_equal(x, y) for x, y in zip(a, b))
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        spark_tbl = load_spark_result(os.path.join(out_dir, name))
        if spark_tbl is None:
            print(f"FAIL  {name}: no spark output")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name}: no oracle (rows={spark_tbl.num_rows})")
            n_noracle += 1
            continue
        try:
            # Type-kind guard: the driver's hasher distinguishes int vs
            # float representations, so a DuckDB HUGEINT (SUM over
            # BIGINT) or DOUBLE paired with a Spark integer column (or
            # vice versa) hash-mismatches even when values are equal.
            # Surface that locally instead of letting vals_equal hide it.
            rel = con.sql(oracles[name])
            dtypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            stypes = {f.name: str(spark_tbl.schema.field(f.name).type)
                      for f in spark_tbl.schema}
            for c, dt in dtypes.items():
                st = stypes.get(c, "")
                d_int = dt in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                               "HUGEINT", "UTINYINT", "USMALLINT",
                               "UINTEGER", "UBIGINT")
                s_int = st.startswith("int") or st.startswith("uint")
                d_flt = dt in ("FLOAT", "DOUBLE") or dt.startswith("DECIMAL")
                s_flt = st in ("float", "double") or st.startswith("decimal")
                if dt == "HUGEINT":
                    print(f"WARN  {name}: oracle column {c} is HUGEINT "
                          f"(cast to BIGINT in the oracle SQL)")
                if (d_int and s_flt) or (d_flt and s_int):
                    print(f"WARN  {name}: type-kind mismatch on {c}: "
                          f"spark {st} vs duckdb {dt}")
            duck = con.execute(oracles[name])
            dnames = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        snames = spark_tbl.column_names
        srows = [tuple(spark_tbl.column(c)[i].as_py() for c in snames)
                 for i in range(spark_tbl.num_rows)]
        cs_names, cs_rows = canon(snames, srows)
        cd_names, cd_rows = canon(dnames, drows)
        if cs_names != cd_names:
            print(f"FAIL  {name}: columns {cs_names} vs {cd_names}")
            n_fail += 1
            continue
        if len(cs_rows) != len(cd_rows):
            print(f"FAIL  {name}: rowcount {len(cs_rows)} vs {len(cd_rows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(cs_rows, cd_rows))
               if not vals_equal(a, b)]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)} mismatched rows; first @{i}:")
            print(f"      spark: {a}")
            print(f"      duck : {b}")
            n_fail += 1
            continue
        inexact = sum(1 for a, b in zip(cs_rows, cd_rows) if not bit_equal(a, b))
        tag = "PASS " if inexact == 0 else f"PASS~ ({inexact} rows not bit-equal)"
        print(f"{tag} {name} ({len(cs_rows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} oracle-less")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
