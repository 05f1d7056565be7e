#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and compare (schema-insensitively: columns
sorted by name, rows sorted) against the Verify parquet output."""
import sys, json, glob
import duckdb

def norm(v):
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        con = duckdb.connect()
        for t in ["region","nation","customer","supplier","part","orders",
                  "lineitem","events","documents","embeddings"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        try:
            odf = con.execute(sql).fetch_arrow_table()
            ocols = sorted(odf.column_names)
            orows = sorted(tuple(norm(r[c]) for c in ocols) for r in odf.to_pylist())
        except Exception as e:
            results[name] = f"ORACLE-ERROR {str(e)[:200]}"
            continue
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            gdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            gcols = sorted(gdf.column_names)
            grows = sorted(tuple(norm(r[c]) for c in gcols) for r in gdf.to_pylist())
        except Exception as e:
            results[name] = f"SPARK-READ-ERROR {str(e)[:200]}"
            continue
        if gcols != ocols:
            results[name] = f"SCHEMA-MISMATCH spark={gcols} oracle={ocols}"
        elif len(grows) != len(orows):
            results[name] = f"ROWCOUNT spark={len(grows)} oracle={len(orows)}"
        elif grows != orows:
            diff = [i for i, (a, b) in enumerate(zip(grows, orows)) if a != b][:3]
            ex = [(grows[i], orows[i]) for i in diff]
            results[name] = f"VALUE-MISMATCH n={sum(1 for a,b in zip(grows,orows) if a!=b)} first={ex}"
        else:
            results[name] = f"OK rows={len(grows)}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(f"{'PASS' if v.startswith('OK') else 'FAIL'} {k}: {v[:400]}")
    print(f"\n{ok}/{len(results)} queries match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
