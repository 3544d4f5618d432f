#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<name> parquet written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the sf_dir parquet tables,
and compares: row count, column names, and exact values (rows sorted,
columns sorted by name). Reports EXACT vs CLOSE (<=1e-9 rel) vs MISMATCH.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(
        (x is None, str(type(x)), str(x)) for x in r))


def values_close(a, b):
    if type(a) is float or type(b) is float:
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return a == b


def rows_close(ra, rb):
    return len(ra) == len(rb) and all(
        len(x) == len(y) and all(values_close(u, v) for u, v in zip(x, y))
        for x, y in zip(ra, rb))


def main():
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    results = {}
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_cols, s_rows = norm_rows(spark_rel.columns, spark_rel.fetchall())
        if name not in oracle:
            results[name] = f"NO-ORACLE rows={len(s_rows)}"
            continue
        try:
            o_rel = con.sql(oracle[name])
            # The driver's hash is dtype-sensitive: DuckDB types a bare
            # sum(<integer>) as HUGEINT (int128) while Spark emits BIGINT,
            # which red-flags a value-identical result (r8's q12 /
            # ta_hash_features). Catch it here so it never ships again:
            # every integer aggregate output must be CAST(... AS BIGINT).
            huge = [c for c, t in zip(o_rel.columns, o_rel.types)
                    if "HUGEINT" in str(t).upper()]
            if huge:
                results[name] = f"HUGEINT-DTYPE cols={huge} (CAST AS BIGINT)"
                continue
            o_cols, o_rows = norm_rows(o_rel.columns, o_rel.fetchall())
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR {str(e).splitlines()[0][:160]}"
            continue
        if s_cols != o_cols:
            results[name] = f"SCHEMA-MISMATCH spark={s_cols} oracle={o_cols}"
        elif len(s_rows) != len(o_rows):
            results[name] = (f"ROWCOUNT-MISMATCH spark={len(s_rows)} "
                             f"oracle={len(o_rows)}")
        elif s_rows == o_rows:
            results[name] = f"EXACT rows={len(s_rows)}"
        elif rows_close(s_rows, o_rows):
            diff = next((i, a, b) for i, (a, b) in
                        enumerate(zip(s_rows, o_rows)) if a != b)
            results[name] = f"CLOSE rows={len(s_rows)} first_diff={diff}"
        else:
            diff = next(((i, a, b) for i, (a, b) in
                         enumerate(zip(s_rows, o_rows)) if not
                         rows_close([a], [b])), None)
            results[name] = f"VALUE-MISMATCH rows={len(s_rows)} first_diff={diff}"
    n_exact = sum(1 for v in results.values() if v.startswith("EXACT"))
    n_noracle = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    for name, res in sorted(results.items()):
        flag = "  " if res.startswith(("EXACT", "NO-ORACLE")) else "!!"
        print(f"{flag} {name}: {res}")
    print(f"\n{n_exact}/{len(results)} EXACT, {n_noracle} no-oracle, "
          f"{len(results) - n_exact - n_noracle} failing")
    sys.exit(0 if len(results) == n_exact + n_noracle else 1)


if __name__ == "__main__":
    main()
