#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (testing aid only —
not part of the shipped library). Usage:

    python3 tools/selfcheck.py <verify_outdir> <sf_dir>

For each query in <outdir>/oracle_sql.json: run the SQL in DuckDB over the
sf parquet tables, load the Spark result parquet, and compare BOTH the
column-sorted values and the DuckDB logical TYPES of every column.

Type strictness (this is what round 2's selfcheck missed — it compared
values only, so 16 queries whose outputs differed in column type, e.g.
Spark sum -> DECIMAL(28,2) vs DuckDB sum -> DECIMAL(38,2), reported green
locally while the driver's typed hash failed them all):
  - plain integer widths (TINYINT/SMALLINT/INTEGER/BIGINT) are
    canonicalized to one family — empirically the driver's hash does the
    same (q_array_funcs passed r2 with an INTEGER-vs-BIGINT column) — but
    a width difference still prints a WARN so it can be eliminated;
  - every other difference (DECIMAL precision/scale, HUGEINT, FLOAT vs
    DOUBLE, int vs float, VARCHAR vs anything) is a hard FAIL.

The value compare is EXACT, floats included (only NaN==NaN is
special-cased); there is deliberately NO str()-equality fallback — the
catalog's determinism rules (decimal sums cast to double once, raw stored
doubles, rank-only floats) exist precisely so exact comparison holds."""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Signed widths only: the driver's width-canonicalization was observed for
# plain signed ints (q_array_funcs, r2); an unsigned DuckDB type (UBIGINT
# etc.) has never been observed to canonicalize, so it hard-fails here
# rather than reporting green locally and failing the driver hash.
INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}


def canon_type(t):
    return "INTFAM" if t in INT_FAMILY else t


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [cols[i] for i in order], out


# pandas dtype canonicalization for the driver-representation gate: the
# driver demonstrably tolerates plain int-width differences (q_array_funcs
# r2) and µs-vs-ns datetime64 resolution (the r10 timestamp queries were
# green across both testdata encodings); everything else must match.
def canon_dtype(d):
    s = str(d)
    if s.startswith(("int", "Int")):
        return "INTFAM"
    if s.startswith("datetime64"):
        return "DATETIME"
    return s


def pandas_repr_diffs(sdf, odf, cols):
    """The r10 failure class: a column can compare equal through DuckDB's
    value model yet reach the driver's pandas-hash layer as two different
    representations (the driver loads Spark parquet via pyarrow->pandas and
    the oracle via duckdb .df()). DECIMAL(38,0) did exactly that in r10:
    both selfcheck sides read through DuckDB and passed, the driver hashed
    a pyarrow-decimal object column against duckdb's float64 and failed.
    Compare dtype per column, and for object columns the Python class and
    hashability of the first non-null cell (the driver's pandas sort/hash
    raises on unhashable cells — the r4 ndarray failure)."""
    diffs = []
    for c in cols:
        sd, od = sdf[c].dtype, odf[c].dtype
        if canon_dtype(sd) != canon_dtype(od):
            diffs.append(f"{c}: spark-pandas={sd} oracle-pandas={od}")
            continue
        if str(sd) == "object":
            # nulls in object columns arrive as None from pyarrow but can be
            # float NaN from duckdb .df() — skip BOTH null spellings, else
            # the class compare hits the NaN and spuriously FAILs the column
            def first_real(col):
                for v in col:
                    if v is None:
                        continue
                    if isinstance(v, float) and math.isnan(v):
                        continue
                    return v
                return None
            sv = first_real(sdf[c])
            ov = first_real(odf[c])
            # one side all-null, the other not (row counts already known
            # equal): a representation difference the class compare below
            # can't see — flag it instead of silently passing
            if (sv is None) != (ov is None):
                diffs.append(f"{c}: spark-cell="
                             f"{'all-null' if sv is None else type(sv).__name__} "
                             f"oracle-cell="
                             f"{'all-null' if ov is None else type(ov).__name__}")
                continue
            if sv is not None and ov is not None and type(sv) is not type(ov):
                diffs.append(f"{c}: spark-cell={type(sv).__name__} "
                             f"oracle-cell={type(ov).__name__}")
                continue
            try:
                hash(sv), hash(ov)
            except TypeError as e:
                diffs.append(f"{c}: unhashable pandas cell ({e})")
    return diffs


def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_warn = 0
    for name, sql in sorted(oracles.items()):
        try:
            orel = con.sql(sql)
            ocols = list(orel.columns)
            otypes = [str(t) for t in orel.types]
            orows = orel.fetchall()
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
            srel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols = list(srel.columns)
            stypes = [str(t) for t in srel.types]
            srows = srel.fetchall()
            if sorted(ocols) != sorted(scols):
                print(f"FAIL {name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}")
                n_fail += 1; continue
            # the driver sorts every result column with pandas sort_values,
            # which raises "unhashable type: numpy.ndarray" on LIST/STRUCT/MAP
            # cells (observed r4: q_doc_winnow/q_embed_quant/q_sample_k) —
            # nested result columns must be stringified (array_join) upstream
            nested = [(c, t) for c, t in list(zip(scols, stypes)) + list(zip(ocols, otypes))
                      if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "UNION"))]
            if nested:
                det = ", ".join(f"{c}: {t}" for c, t in nested)
                print(f"FAIL {name}: nested result column (driver pandas sort cannot hash it) — {det}")
                n_fail += 1; continue
            # typed compare, column-name order (the driver sorts by name too)
            otype_by = dict(zip(ocols, otypes))
            stype_by = dict(zip(scols, stypes))
            type_bad = [(c, stype_by[c], otype_by[c]) for c in sorted(ocols)
                        if canon_type(stype_by[c]) != canon_type(otype_by[c])]
            if type_bad:
                det = ", ".join(f"{c}: spark={st} oracle={ot}" for c, st, ot in type_bad)
                print(f"FAIL {name}: column TYPES differ — {det}")
                n_fail += 1; continue
            width_warn = [(c, stype_by[c], otype_by[c]) for c in sorted(ocols)
                          if stype_by[c] != otype_by[c]]
            if width_warn:
                det = ", ".join(f"{c}: spark={st} oracle={ot}" for c, st, ot in width_warn)
                print(f"WARN {name}: int-width diff (driver canonicalizes, but don't rely on it) — {det}")
                n_warn += 1
            # driver-representation gate (the r10 DECIMAL(38,0) escape):
            # replay the driver's actual loaders — Spark side through
            # pyarrow->pandas, oracle side through duckdb .df() — and
            # require the per-column pandas representations to agree.
            sdf = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            odf = orel.df()
            repr_bad = pandas_repr_diffs(sdf, odf, sorted(ocols))
            if repr_bad:
                det = ", ".join(repr_bad)
                print(f"FAIL {name}: driver pandas representation differs — {det}")
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
    print(f"== {n_pass} pass, {n_fail} fail, {n_warn} int-width warn ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
