#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py [--exact] <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle_sql.json SQL in DuckDB over <sfDir>/*.parquet, sorts columns by name
and rows by all columns, and compares values.

Two modes:
  default (tolerance) — floats compared at 1e-6 abs/rel; good for
    iteration, but BLIND to what the driver's hash gate sees (round-7
    postmortem: d58/q55 passed here with HUGEINT-vs-BIGINT result types
    and q39 passed with a last-cent float delta, then all three FAILed
    the driver's typed-value hash).
  --exact (or GRAFT_EXACT=1) — driver-faithful: FAILs on any result-type
    mismatch between the DuckDB oracle result (DESCRIBE) and the dumped
    Spark parquet schema (DuckDB's view of it), and on any float whose
    exact repr differs. Run THIS mode before claiming a query green.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            rr.append(v)
        out.append(tuple(rr))
    return sorted(out, key=lambda t: tuple(("" if x is None else str(x)) for x in t))


def cmp_rows(a, b, exact=False):
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    worst = 0.0
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return f"col count {len(ra)} vs {len(rb)}"
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb):
                    continue
                if exact:
                    # The driver hashes the value itself; any bit-level
                    # difference (e.g. summation-order rounding) FAILs there.
                    if va != vb:
                        return f"float mismatch (exact) {va!r} vs {vb!r}"
                    continue
                d = abs(va - vb)
                rel = d / max(abs(va), abs(vb), 1e-12)
                worst = max(worst, min(d, rel))
                if d > 1e-6 and rel > 1e-6:
                    return f"float mismatch {va} vs {vb}"
            elif va != vb:
                return f"value mismatch {va!r} vs {vb!r}"
    return f"OK (worst float delta {worst:.2e})" if worst > 0 else "OK"


def result_types(con, sql):
    """column -> DuckDB type string for a query's result schema."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}


def type_mismatches(spark_types, duck_types):
    """Driver-faithful type identity: the driver hashes TYPED values, so
    DuckDB HUGEINT 30 != the BIGINT 30 Spark dumped even though the
    tolerance compare (python ints) can't tell them apart. Compare the
    DuckDB-read parquet schema against the DuckDB oracle result schema
    verbatim — any difference is a driver-hash FAIL."""
    bad = []
    for c in sorted(set(spark_types) | set(duck_types)):
        st, dt = spark_types.get(c), duck_types.get(c)
        if st != dt:
            bad.append(f"{c}: spark={st} oracle={dt}")
    return bad


def nested_cols(types):
    """Columns whose type the driver's pandas canonicalization cannot sort
    (round-8 postmortem: d78's array<string> crashed the driver harness with
    'unhashable type: numpy.ndarray' — rows/hash never evaluated). Any
    nested DuckDB type at the TOP level of an oracled dump is a gate
    incompatibility regardless of value correctness; serialize it
    (concat_ws / to_json) in the query projection instead."""
    bad = []
    for c, t in sorted(types.items()):
        tu = t.upper()
        if "[]" in tu or tu.startswith(("STRUCT", "MAP", "LIST", "UNION")):
            bad.append(f"{c}: {t}")
    return bad


def main():
    argv = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv or os.environ.get("GRAFT_EXACT") == "1"
    sf_dir, out_dir = argv[0], argv[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    dumped = set(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    # Every oracled name is reported even when Verify produced no dump for
    # it (a crashed query) — a breakage must surface as a FAIL row, never
    # as a silently shorter report. SPARK_GRAFT_QUERIES (same prefix
    # contract as Verify/Bench) narrows the expectation for local iteration.
    expected = set(oracle)
    only = os.environ.get("SPARK_GRAFT_QUERIES")
    if only:
        prefixes = [p.strip() for p in only.split(",") if p.strip()]
        expected = {n for n in expected if any(n.startswith(p) for p in prefixes)}
    names = sorted(dumped | expected)
    n_ok = n_bad = n_rowsonly = 0
    for name in names:
        if name not in dumped:
            print(f"FAIL  {name}: no dump dir (query crashed or was never run)")
            n_bad += 1
            continue
        err_marker = os.path.join(out_dir, name, "_ERROR")
        if os.path.exists(err_marker):
            msg = open(err_marker).read().strip().splitlines()
            print(f"FAIL  {name}: query crashed: {msg[0] if msg else 'unknown'}")
            n_bad += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(c[0] for c in spark_rel.description)
            spark_rows = norm(con.execute(
                f"SELECT {', '.join(spark_cols)} FROM '{out_dir}/{name}/*.parquet'").fetchall())
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if spark_rows else "ROWS-ONLY-EMPTY!"
            print(f"{status:9s} {name}: {len(spark_rows)} rows")
            n_rowsonly += 1
            continue
        try:
            rel = con.execute(oracle[name])
            cols = sorted(c[0] for c in rel.description)
            duck_rows = norm(con.execute(
                f"SELECT {', '.join(cols)} FROM ({oracle[name]}) oq").fetchall())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if cols != spark_cols:
            print(f"FAIL  {name}: columns {spark_cols} vs oracle {cols}")
            n_bad += 1
            continue
        if exact:
            try:
                st = result_types(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
                dt = result_types(con, f"SELECT * FROM ({oracle[name]}) oq")
            except Exception as e:
                print(f"FAIL  {name}: DESCRIBE error: {e}")
                n_bad += 1
                continue
            unsortable = nested_cols(st)
            if unsortable:
                print(f"FAIL  {name}: harness-incompatible nested column "
                      f"[{'; '.join(unsortable)}] — the driver's pandas "
                      "sort crashes on nested values; serialize in the "
                      "query projection (see tutorial/README.md, "
                      "'Authoring oracled queries')")
                n_bad += 1
                continue
            bad = type_mismatches(st, dt)
            if bad:
                print(f"FAIL  {name}: result type mismatch [{'; '.join(bad)}]")
                n_bad += 1
                continue
        verdict = cmp_rows(spark_rows, duck_rows, exact=exact)
        if verdict.startswith("OK"):
            print(f"ok    {name}: {len(spark_rows)} rows  {verdict[3:]}")
            n_ok += 1
        else:
            print(f"FAIL  {name}: {verdict}")
            n_bad += 1
    mode = "exact (driver-faithful)" if exact else "tolerance (iteration only)"
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rowsonly} rows-only  [mode: {mode}]")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
