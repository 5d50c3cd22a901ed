#!/usr/bin/env python3
"""Local twin of the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir>

Reads <verify_out_dir>/oracle_sql.json (written by graft.Verify), creates
views documents/embeddings/events over <sf_dir>, runs each oracle SQL, and
compares against the Spark parquet dump in <verify_out_dir>/<query>/ as an
order-insensitive multiset (doubles compared by raw bits after the oracle's
own 6dp rounding).
"""
import sys, json, glob, struct
import duckdb

def canon(v):
    if isinstance(v, float):
        return struct.pack(">d", v).hex()
    return repr(v)

def rows_key(rows):
    return sorted([tuple(canon(v) for v in r) for r in rows])

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark dump")
            n_bad += 1
            continue
        try:
            orc = con.execute(sql)
            ocols = [d[0] for d in orc.description]
            orows = orc.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            n_bad += 1
            continue
        sp = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        scols = [d[0] for d in sp.description]
        srows = sp.fetchall()
        schema_ok = [c.lower() for c in scols] == [c.lower() for c in ocols]
        rows_ok = len(srows) == len(orows)
        hash_ok = rows_key(srows) == rows_key(orows)
        if schema_ok and rows_ok and hash_ok:
            print(f"{name}: OK ({len(srows)} rows)")
            n_ok += 1
        else:
            print(f"{name}: FAIL schema={schema_ok} rows={len(srows)}/{len(orows)} hash={hash_ok}")
            if not hash_ok and rows_ok and schema_ok:
                a, b = rows_key(srows), rows_key(orows)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"  spark {x}\n  oracle {y}")
            n_bad += 1
    print(f"== {n_ok} OK / {n_bad} FAIL ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
