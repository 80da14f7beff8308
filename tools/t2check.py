#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: t2check.py <verifyOutDir> <sfDir>

Loads each <outDir>/<name>/ parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB over views named after the sfDir
tables, and compares: column names (sorted), row count, and values in result
order. Exact match for non-floats; 1e-9 relative tolerance for floats (the
real driver hashes — our queries round to 4dp so this flags real drift).
Dtype family mismatches (int vs float, anything vs string) are reported as
failures since a stringifying hash would diverge on them.

DECLARED-SCHEMA check (added after the r10 b119 slip): before any value
comparison, the DuckDB relation's *declared* column types are compared to
the Spark parquet schema's declared types, normalized to the pandas dtype
the driver would materialize. DuckDB widens sum(BIGINT) to HUGEINT (int128)
and sum(INT)/avg to DECIMAL; both survive Python's value-level `int`
comparison (so the old family() check passed) but land in pandas as
float64/object and fail the driver's type-sensitive hash. Any
HUGEINT/DECIMAL-vs-int (or other cross-family) declared mismatch is now a
hard FAIL even when every value compares equal.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    try:
        import numpy as np
        if isinstance(v, np.generic):
            v = v.item()
    except ImportError:
        pass
    if isinstance(v, float) and math.isnan(v):
        return None
    return v

def family(v):
    if v is None: return "null"
    if isinstance(v, bool): return "bool"
    if isinstance(v, int): return "int"
    if isinstance(v, float): return "float"
    if isinstance(v, str): return "str"
    return type(v).__name__

def declared_family(duck_type):
    """Map a DuckDB declared type string to the pandas dtype family the
    driver's hash sees. HUGEINT and DECIMAL are deliberately NOT 'int':
    pandas materializes them as float64/object, so they hash differently
    from BIGINT even when values are identical (the b119 failure class)."""
    t = str(duck_type).upper()
    if t.startswith("DECIMAL"): return "decimal"
    if t in ("HUGEINT", "UHUGEINT"): return "int128"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"): return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"): return "float"
    if t == "BOOLEAN": return "bool"
    if t in ("VARCHAR", "TEXT", "STRING", "BLOB"): return "str"
    if t == "DATE": return "date"
    if t.startswith("TIMESTAMP"): return "timestamp"
    if t.startswith(("STRUCT", "MAP")) or t.endswith("[]") or t.startswith("LIST"):
        return "complex"
    return t


def declared_schema_mismatches(srel, drel):
    """Compare declared dtypes of the Spark-result relation vs the oracle
    relation, keyed by (sorted) column name. Returns [(col, spark, duck)]."""
    stypes = {c: t for c, t in zip(srel.columns, srel.types)}
    dtypes = {c: t for c, t in zip(drel.columns, drel.types)}
    bad = []
    for c in sorted(set(stypes) & set(dtypes)):
        fs, fd = declared_family(stypes[c]), declared_family(dtypes[c])
        if fs != fd:
            bad.append((c, str(stypes[c]), str(dtypes[c])))
    return bad


def cells_equal(a, b):
    a, b = norm_cell(a), norm_cell(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if not (isinstance(a, (int, float)) and isinstance(b, (int, float))):
            return False
        fa, fb = float(a), float(b)
        if math.isinf(fa) or math.isinf(fb): return fa == fb
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))
    return a == b

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            # a SPARK_GRAFT_ONLY-restricted Verify drive legitimately leaves
            # most entries unwritten — skip (and count) them instead of
            # drowning the report in FAIL lines (VERDICT r17 item 5). On a
            # FULL (unrestricted) run a missing output dir means the entry
            # crashed before writing, which must stay a FAIL or the oracle
            # gate silently exits 0 on broken entries (ADVICE r18 item 1).
            if only:
                n_skip += 1
            else:
                print(f"FAIL {name}: no Spark output dir (entry crashed "
                      f"before writing on a full drive)")
                n_fail += 1
            continue
        try:
            srel = con.sql(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            drel = con.sql(sql)
            scols, dcols = list(srel.columns), list(drel.columns)
            schema_bad = declared_schema_mismatches(srel, drel)
            sdf = srel.fetchall()
            ddf = drel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ok = True
        for c, st, dt in schema_bad:
            print(f"FAIL {name}: col {c} declared dtype spark={st} duck={dt} "
                  f"— driver's type-sensitive hash would diverge")
            ok = False
        # The real driver sorts the result frame in pandas before hashing;
        # list/map cells are unhashable there (r01: b21/b36/b37 crashed).
        # Flag ANY complex-typed cell as a failure locally — every row is
        # scanned (a nullable array column can have NULL in row 0), with
        # one report per offending column.
        def complex_cols(rows, cols):
            bad = set()
            for row in rows:
                for c, v in zip(cols, row):
                    if c not in bad and (isinstance(v, (list, tuple, dict))
                                         or type(v).__name__ == "ndarray"):
                        bad.add(c)
            return bad
        for c in sorted(complex_cols(sdf, scols) | complex_cols(ddf, dcols)):
            print(f"FAIL {name}: col {c} is complex-typed — driver pandas sort would crash")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(sdf) != len(ddf):
            print(f"FAIL {name}: rows spark={len(sdf)} duck={len(ddf)}")
            ok = False
        else:
            s_idx = [scols.index(c) for c in sorted(scols)]
            d_idx = [dcols.index(c) for c in sorted(dcols)]
            for i, (sr, dr) in enumerate(zip(sdf, ddf)):
                srow = [sr[j] for j in s_idx]
                drow = [dr[j] for j in d_idx]
                for c, (a, b) in zip(sorted(scols), zip(srow, drow)):
                    fa, fb = family(norm_cell(a)), family(norm_cell(b))
                    if fa != fb and "null" not in (fa, fb) and {fa, fb} != {"int", "float"}:
                        print(f"FAIL {name}: row {i} col {c} dtype {fa} vs {fb} ({a!r} vs {b!r})")
                        ok = False; break
                    if not cells_equal(a, b):
                        print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
                        ok = False; break
                if not ok:
                    break
        if ok:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_skip} skipped (no output dir), {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
