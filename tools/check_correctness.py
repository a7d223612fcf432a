#!/usr/bin/env python3
"""Dev-side correctness checker mirroring the driver's DuckDB oracle gate.

NOT part of the shipped library (the engine is pure Scala/Spark) — this
is the local feedback loop: run graft.Verify to dump query results, then
compare each against its oracleSql executed by DuckDB on the same
parquet tables. Usage:
    python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            # Read the Spark dump the way the driver does (pyarrow→pandas),
            # NOT via DuckDB: DuckDB silently coerces parquet DECIMAL to
            # float64, masking decimal-typed outputs that the driver hashes
            # as Decimal objects (round-4 lesson: q8/q9/q10/q14/q17).
            import glob as _glob
            import pyarrow.parquet as _pq
            _files = _glob.glob(f"{out_dir}/{name}/*.parquet")
            _tbl = _pq.read_table(_files[0]) if len(_files) == 1 else \
                _pq.ParquetDataset(f"{out_dir}/{name}").read()
            _dec = [f.name for f in _tbl.schema if "decimal" in str(f.type)]
            if _dec:
                print(f"FAIL {name}: DECIMAL output columns {_dec} "
                      "(driver hashes Decimal objects != DuckDB doubles; "
                      "CAST to DOUBLE in the Spark query)")
                failures += 1
                continue
            got = _tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
            print(f"WARN {name}: dtypes {list(map(str, g.dtypes))} != {list(map(str, w.dtypes))}")
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        eq = g.equals(w)
        if not eq:
            # pinpoint first differing cell
            diffcols = [c for c in g.columns if not g[c].equals(w[c])]
            print(f"FAIL {name}: value mismatch in cols {diffcols}")
            for c in diffcols[:2]:
                mask = ~(g[c].eq(w[c]) | (g[c].isna() & w[c].isna()))
                idx = mask[mask].index[:3]
                for i in idx:
                    print(f"   row {i}: got={g[c][i]!r} want={w[c][i]!r}")
            failures += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
    # rows-only queries (no oracle)
    import glob, os
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracles:
            n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')",
                           connection=con).fetchone()[0]
            print(f"rows {name}: {n} rows (no oracle)")
    print(f"\n{failures} failures / {len(oracles)} oracle queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
