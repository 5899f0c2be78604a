#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev harness only; not
part of the shipped library). Usage:

    python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/vout

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with the sf tables registered as
views, and compares schema-insensitively: columns sorted by name, rows in
output order, values compared exactly (floats bitwise via repr, decimals as
decimals)."""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision; bit-identity check
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def kind(arrow_type):
    """Normalize an arrow type to the dtype class the driver's pandas-based
    hash distinguishes: HUGEINT (decimal) and float render differently from
    int even when values are numerically equal."""
    t = str(arrow_type)
    if "list" in t or "struct" in t or "map" in t:
        return "nested"
    if t.startswith("decimal"):
        return "decimal"
    if t in ("float", "double", "halffloat", "float32", "float64"):
        return "float"
    if t.startswith(("int", "uint")):
        return "int"
    if t.startswith("timestamp"):
        return "timestamp"  # ns-vs-us resolution is benign: values canon at µs
    return t


def table_rows(reader):
    cols = sorted(reader.column_names)
    tbl = reader.select(cols)
    kinds = [kind(tbl.schema.field(c).type) for c in cols]
    return cols, kinds, [tuple(canon(v) for v in row) for row in zip(*(c.to_pylist() for c in tbl.columns))]


def main(sf_dir, out_dir):
    import pyarrow.parquet as pq
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        spark_tbl = pq.read_table(str(Path(out_dir, name)))
        s_cols, s_kinds, s_rows = table_rows(spark_tbl)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(s_rows)} rows")
            continue
        d_tbl = con.execute(oracle[name]).fetch_arrow_table()
        d_cols, d_kinds, d_rows = table_rows(d_tbl)
        status = "OK"
        if "nested" in s_kinds or "nested" in d_kinds:
            # the driver's comparer sorts rows with pandas, which cannot sort
            # array/struct columns — a nested output column is a hard failure
            # there even when values match
            status = f"NESTED OUTPUT COLUMN spark={list(zip(s_cols, s_kinds))} duck={list(zip(d_cols, d_kinds))}"
        elif s_cols != d_cols:
            status = f"SCHEMA MISMATCH spark={s_cols} duck={d_cols}"
        elif s_kinds != d_kinds:
            # e.g. DuckDB windowed SUM(BIGINT) → HUGEINT → pandas float,
            # which the driver's dtype-sensitive hash sees as 0.0 vs 0
            status = f"DTYPE MISMATCH spark={list(zip(s_cols, s_kinds))} duck={list(zip(d_cols, d_kinds))}"
        elif len(s_rows) != len(d_rows):
            status = f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}"
        else:
            for i, (a, b) in enumerate(zip(s_rows, d_rows)):
                if a != b:
                    status = f"VALUE MISMATCH at row {i}: spark={a} duck={b}"
                    break
        ok = status == "OK"
        failures += 0 if ok else 1
        print(f"  [{'ok' if ok else 'FAIL'}] {name}: {len(s_rows)} rows" + ("" if ok else f" — {status}"))
    extra = set(oracle) - {p.name for p in Path(out_dir).iterdir() if p.is_dir()}
    if extra:
        failures += len(extra)
        print(f"  [FAIL] oracle entries with no spark output: {sorted(extra)}")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
