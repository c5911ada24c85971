#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against DuckDB executing oracle_sql.json on the same source tables.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(table):
    """Sort columns by name; return (schema_desc, rows as tuples)."""
    cols = sorted(table.column_names)
    t = table.select(cols)
    rows = list(zip(*[t.column(c).to_pylist() for c in cols])) if cols else []
    return cols, rows


def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)  # exact: the driver hashes values
        except (TypeError, ValueError):
            return False
    # timestamps: compare as utc naive
    import datetime
    if isinstance(a, datetime.datetime) and isinstance(b, datetime.datetime):
        return a.replace(tzinfo=None) == b.replace(tzinfo=None)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        spark_tbl = ds.dataset(qdir, format="parquet").to_table()
        if name not in oracle:
            status = "ROWS_ONLY" if spark_tbl.num_rows > 0 else "ROWS_ONLY_EMPTY!"
            n_rowsonly += 1
            print(f"{status:18s} {name} rows={spark_tbl.num_rows}")
            continue
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"ORACLE_ERROR       {name}: {e}")
            n_fail += 1
            continue
        # The driver's hash covers VALUE TYPES, not just values: DuckDB
        # HUGEINT (arrow decimal128) from an untyped sum() hash-mismatches a
        # Spark BIGINT even when every value is identical (q63/q35/q22).
        # Fail here so the local gate catches what value-compare can't.
        import pyarrow.types as pat
        hazards = [f.name for f in duck_tbl.schema if pat.is_decimal(f.type)]
        if hazards:
            print(f"TYPE_HAZARD        {name}: decimal/hugeint cols {hazards} — cast in the oracle")
            n_fail += 1
            continue
        sc, sr = norm(spark_tbl)
        dc, dr = norm(duck_tbl)
        if sc != dc:
            print(f"SCHEMA_MISMATCH    {name}: spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"ROWCOUNT_MISMATCH  {name}: spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (r1, r2) in enumerate(zip(sr, dr)):
            if not all(cell_eq(x, y) for x, y in zip(r1, r2)):
                bad = (i, r1, r2)
                break
        if bad:
            print(f"VALUE_MISMATCH     {name} row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS               {name} rows={len(sr)}")
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
