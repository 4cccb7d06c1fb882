#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by `graft.Verify` (parquet under <verifyOutDir>/<name>/
plus oracle_sql.json), runs the oracle SQL in DuckDB over the same sf
parquet tables, sorts columns by name and rows by all columns, and
compares values. Prints one line per query.
"""
import sys, os, json, math, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9) + 0.0  # also folds -0.0 to 0.0
    return v


def tclass(t) -> str:
    """Column-type equivalence class for the driver's hash compare.

    Round-1 evidence: int widths up to 64 bits unify (Spark int32 vs
    DuckDB BIGINT passed), but DECIMAL vs DOUBLE and HUGEINT vs BIGINT
    hash-mismatch (every DECIMAL/HUGEINT-output query failed despite
    equal values — arrow encodes them as decimal128/float64). So value
    equality alone is NOT enough; this class must match too.
    """
    s = str(t)
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    return s  # HUGEINT, DECIMAL(p,s), FLOAT, DOUBLE, ... stay distinct


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    # a query Verify FAILED to build leaves no output dir at all — it
    # must count as a failure, not silently narrow the checked set
    # (r12 lesson: a broken q_snapshot_catalog hid behind "ALL PASS"
    # of the queries that did land). Subset runs stay usable: when the
    # outdir holds only some queries, only the oracle entries for the
    # present-or-requested names are expected — Verify dumps
    # oracle_sql.json for EVERY registered query, so "expected" is the
    # dump filtered to subset markers when present.
    requested = f"{outdir}/requested.json"
    expected = (set(json.load(open(requested)))
                if os.path.exists(requested) else set(oracle))
    present = {n for n in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, n))}
    for name in sorted(expected - present):
        print(f"{name}: MISSING (Verify failed to build/run it)")
        failures += 1
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"{name}: NO-OUTPUT")
            failures += 1
            continue
        got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = sorted(got_rel.columns)
        got = con.sql(
            f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall()
        if name not in oracle:
            print(f"{name}: rows-only ({len(got)} rows, no oracle)")
            if len(got) == 0:
                failures += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE-SQL-ERROR {e}")
            failures += 1
            continue
        exp_cols = sorted(exp_rel.columns)
        if [c.lower() for c in got_cols] != [c.lower() for c in exp_cols]:
            print(f"{name}: SCHEMA-MISMATCH got={got_cols} exp={exp_cols}")
            failures += 1
            continue
        got_types = {c.lower(): tclass(t)
                     for c, t in zip(got_rel.columns, got_rel.types)}
        exp_types = {c.lower(): tclass(t)
                     for c, t in zip(exp_rel.columns, exp_rel.types)}
        bad_types = {c: (got_types[c], t) for c, t in exp_types.items()
                     if got_types[c] != t}
        if bad_types:
            print(f"{name}: TYPE-MISMATCH (got, exp): {bad_types}")
            failures += 1
            continue
        exp = con.sql(
            f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall()
        got_s = sorted((tuple(norm(v) for v in r) for r in got), key=repr)
        exp_s = sorted((tuple(norm(v) for v in r) for r in exp), key=repr)
        if len(got_s) != len(exp_s):
            print(f"{name}: ROWCOUNT got={len(got_s)} exp={len(exp_s)}")
            failures += 1
        elif got_s != exp_s:
            diff = next((i, g, e) for i, (g, e) in
                        enumerate(zip(got_s, exp_s)) if g != e)
            print(f"{name}: VALUE-MISMATCH at sorted row {diff[0]}\n"
                  f"  got={diff[1]}\n  exp={diff[2]}\n  cols={got_cols}")
            failures += 1
        else:
            print(f"{name}: PASS ({len(got_s)} rows)")
    print(f"== {'ALL PASS' if failures == 0 else str(failures) + ' FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
