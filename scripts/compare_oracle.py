#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify's parquet
dumps + oracle_sql.json, run each oracle in DuckDB on the same sf dir, and
compare values exactly (columns sorted by name, rows as written).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math, struct
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        # Bit-compare floats: Python's == treats 0.0 == -0.0, which made this
        # gate blind to the signed-zero infidelity class the driver's hash
        # catches (round 10's idiom_array_filter). NaN stays payload-blind.
        return struct.pack('<d', v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "tolist"):  # numpy
        t = v.tolist()
        return tuple(norm(x) for x in t) if isinstance(t, list) else norm(t)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d): continue
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if not files:
            print(f"FAIL {name}: no parquet written"); n_fail += 1; continue
        tbl = pq.read_table(os.path.join(d, files[0]))
        # The driver's comparator crashes on list-typed columns (pandas
        # sort_values: unhashable numpy.ndarray — r17's only red row). Be at
        # least as strict as the driver: reject them here.
        import pyarrow.types as pat
        bad = [f.name for f in tbl.schema
               if pat.is_list(f.type) or pat.is_large_list(f.type)
               or pat.is_fixed_size_list(f.type)]
        if bad:
            print(f"FAIL {name}: list-typed output columns {bad} — the driver "
                  f"comparator cannot hash lists; serialize (array_join) first")
            n_fail += 1; continue
        cols = sorted(tbl.column_names)
        spark_rows = [tuple(norm(tbl.column(c)[i].as_py()) for c in cols)
                      for i in range(tbl.num_rows)]
        if name not in oracles:
            status = "rows-only"
            print(f"{'OK  ' if tbl.num_rows > 0 else 'WARN'} {name}: {status}, {tbl.num_rows} rows")
            continue
        try:
            duck = con.sql(oracles[name])
            dcols = duck.columns
            res = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        order = sorted(range(len(dcols)), key=lambda i: dcols[i])
        duck_rows = [tuple(norm(r[i]) for i in order) for r in res]
        if sorted(dcols) != cols:
            print(f"FAIL {name}: schema {cols} vs oracle {sorted(dcols)}"); n_fail += 1; continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows {len(spark_rows)} vs {len(duck_rows)}"); n_fail += 1; continue
        # compare both as-written and sorted (driver may or may not sort)
        mism = [i for i,(a,b) in enumerate(zip(spark_rows, duck_rows)) if a != b]
        if mism:
            srt_match = sorted(map(repr, spark_rows)) == sorted(map(repr, duck_rows))
            i = mism[0]
            print(f"FAIL {name}: {len(mism)} row mismatches (sorted-match={srt_match})")
            print(f"      first at {i}:\n      spark={spark_rows[i]}\n      duck ={duck_rows[i]}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(spark_rows)} rows exact"); n_pass += 1
    print(f"\n{n_pass} exact-pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
