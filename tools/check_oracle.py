#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle compare.

Reads <outDir>/oracle_sql.json, runs each SQL in DuckDB with the sf
tables registered as views, loads the Spark parquet result, sorts
columns by name, and compares row count, schema, and values.
"""
import sys, json, glob
import duckdb
import pyarrow.parquet as pq

outdir, sfdir = sys.argv[1], sys.argv[2]
sql = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

fails = []
for name in sorted(sql):
    try:
        oracle = con.execute(sql[name]).fetch_arrow_table()
        # read the whole output dir — queries may write >1 part file
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        got = pq.read_table(files) if files else None
        if got is None:
            fails.append((name, "no spark output")); continue
        o = oracle.select(sorted(oracle.column_names))
        g = got.select(sorted(got.column_names))
        if o.column_names != g.column_names:
            fails.append((name, f"cols oracle={o.column_names} spark={g.column_names}")); continue
        if o.num_rows != g.num_rows:
            fails.append((name, f"rows oracle={o.num_rows} spark={g.num_rows}")); continue
        if [str(t) for t in o.schema.types] != [str(t) for t in g.schema.types]:
            fails.append((name, f"types oracle={[str(t) for t in o.schema.types]} spark={[str(t) for t in g.schema.types]}"))
            continue
        op, gp = o.to_pandas(), g.to_pandas()
        # driver sorts columns by name; rows come from the query's total ORDER BY,
        # but sort rows on all cols anyway to be robust
        cols = list(op.columns)
        op = op.sort_values(cols, kind="mergesort").reset_index(drop=True)
        gp = gp.sort_values(cols, kind="mergesort").reset_index(drop=True)
        if not op.equals(gp):
            neq = (op != gp) & ~(op.isna() & gp.isna())
            bad = neq.any(axis=1)
            fails.append((name, f"values differ in {int(bad.sum())} rows; first: oracle={op[bad].head(2).to_dict('records')} spark={gp[bad].head(2).to_dict('records')}"))
            continue
        print(f"OK   {name} ({o.num_rows} rows)")
    except Exception as e:
        fails.append((name, f"EXC {type(e).__name__}: {e}"))
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(sql)-len(fails)}/{len(sql)} pass")
sys.exit(1 if fails else 0)
