#!/usr/bin/env python3
"""Oracle type lint: catch DuckDB result columns whose type the driver's
value-hash will never match from Spark.

Three rounds, three hash failures (q63, q35, q22) were all the same bug:
DuckDB `sum()` over integers returns HUGEINT (arrow decimal128) while Spark
emits BIGINT — values identical, hash different. This lint plans every
oracle with DESCRIBE (no execution) and fails on any HUGEINT / DECIMAL /
INT128 / UHUGEINT result column, so the bug class dies at commit time.

Usage: python3 tools/lint_oracles.py <sfDir> <oracle_sql.json>
(compare.py also enforces this inline on actual results.)
"""
import json
import re
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
BAD = re.compile(r"HUGEINT|DECIMAL|INT128", re.IGNORECASE)


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for name in sorted(oracle):
        try:
            desc = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            # a missing side-parquet (q45/q46 losers before a Verify run) is
            # not a type hazard; report and move on
            print(f"SKIP (plan error)  {name}: {str(e).splitlines()[0]}")
            continue
        bad = [(c, ty) for c, ty, *_ in desc if BAD.search(ty)]
        if bad:
            n_bad += 1
            cols = ", ".join(f"{c}:{ty}" for c, ty in bad)
            print(f"TYPE_HAZARD        {name}: {cols} — add an explicit CAST (e.g. AS BIGINT)")
        else:
            print(f"OK                 {name}")
    print(f"\n== {n_bad} oracle(s) with untyped-aggregate hazards ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
