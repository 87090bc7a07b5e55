#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (testing aid only —
not part of the shipped library). Usage:

    python3 tools/selfcheck.py <verify_outdir> <sf_dir>

For each query in <outdir>/oracle_sql.json: run the SQL in DuckDB over the
sf parquet tables, load the Spark result parquet, sort columns by name and
rows by value, and compare cell-by-cell. The compare is EXACT, floats
included (only NaN==NaN is special-cased) — the catalog's determinism rules
(decimal sums, raw stored doubles, rank-only floats) exist precisely so
exact comparison holds."""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True
        return False
    return a == b or str(a) == str(b)

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
            sc = con.execute(f"SELECT * FROM read_parquet({files!r})")
            scols = [d[0] for d in sc.description]
            srows = sc.fetchall()
            if sorted(ocols) != sorted(scols):
                print(f"FAIL {name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}")
                n_fail += 1; continue
            ocols2, orows2 = norm(orows, ocols)
            _, srows2 = norm(srows, scols)
            if len(orows2) != len(srows2):
                print(f"FAIL {name}: rowcount spark={len(srows2)} oracle={len(orows2)}")
                n_fail += 1; continue
            bad = None
            for i, (a, b) in enumerate(zip(srows2, orows2)):
                for j, (x, y) in enumerate(zip(a, b)):
                    if not cell_eq(x, y):
                        bad = (i, ocols2[j], x, y); break
                if bad: break
            if bad:
                i, colname, x, y = bad
                print(f"FAIL {name}: row {i} col {colname}: spark={x!r} oracle={y!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(srows2)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
