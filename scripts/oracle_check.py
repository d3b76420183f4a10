import duckdb, json, sys, glob, math
sf = sys.argv[1]; outdir = sys.argv[2]
con = duckdb.connect()
for t in ['documents','embeddings','events','orders','customer','lineitem','nation']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/{sf}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_files:
            fails.append((name, "no spark output")); continue
        sp = con.sql(f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
        orc = con.sql(sql).fetchall()
        def norm(rows):
            return sorted(tuple(round(v,9) if isinstance(v,float) else v for v in r) for r in rows)
        s, o = norm(sp), norm(orc)
        ok = s == o
        print(f"{name}: rows={len(sp)}/{len(orc)} match={ok}")
        if not ok:
            fails.append((name, f"mismatch: spark {len(s)} oracle {len(o)}"))
            for a,b in list(zip(s,o))[:3]:
                if a!=b: print("  spark:", a, "\n  oracle:", b)
    except Exception as e:
        fails.append((name, str(e)[:200])); print(f"{name}: ERROR {str(e)[:200]}")
print("FAILS:", fails if fails else "none")
