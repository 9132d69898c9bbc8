#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare values exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows; stringify values canonically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(repr(v))  # full precision
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out, [cols[i] for i in order]

def type_class(t):
    """Coarse type class for hash-hazard detection. The driver's compare
    coerces DuckDB results through pandas, where HUGEINT (the result of
    any SUM over integers) becomes float64 — so an integer column on the
    Spark side hashed against a HUGEINT oracle column sees "123" vs
    "123.0" even though values are equal. str()-based compare here can't
    see that, so flag it from the declared types instead."""
    t = t.upper().split("(")[0].strip()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT", "NUMBER"):
        return "int"
    if t == "HUGEINT":
        return "hugeint"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "DECIMAL":
        return "decimal"
    return "other"

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # ScaleGen writes directory-parquet
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    if only:  # comma-separated query filter (mirrors Verify's 3rd arg)
        unknown = sorted(only - set(oracle))
        if unknown:
            # a typo'd name must not silently 'pass' by checking nothing —
            # count each unknown as a FAILURE so a caller keying off the
            # exit code can't see green from an all-typo filter
            print(f"NOORACLE filter names not in oracle map: {unknown}")
            n_fail += len(unknown)
        oracle = {k: v for k, v in oracle.items() if k in only}
    for name, sql in sorted(oracle.items()):
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            gtypes = [d[1] for d in got.description]
            want = con.execute(sql)
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
            wtypes = [d[1] for d in want.description]
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        hazards = []
        wtype_by_col = dict(zip(wcols, wtypes))
        for c, gt in zip(gcols, gtypes):
            wt = wtype_by_col.get(c)
            if wt is None:
                continue
            gclass, wclass = type_class(str(gt)), type_class(str(wt))
            if wclass == "hugeint" or (
                    gclass != wclass and {gclass, wclass} <= {
                        "int", "hugeint", "float", "decimal"}):
                hazards.append(f"{c}: spark={gt} oracle={wt}")
        if hazards:
            print(f"TYPEDIFF {name}: " + "; ".join(hazards))
            n_fail += 1
            continue
        gc, gorder = canon(grows, gcols)
        wc, worder = canon(wrows, wcols)
        if gorder != worder:
            print(f"SCHEMA   {name}: spark={gorder} oracle={worder}")
            n_fail += 1
        elif gc == wc:
            print(f"OK       {name} ({len(gc)} rows)")
            n_pass += 1
        else:
            print(f"MISMATCH {name}: {len(gc)} vs {len(wc)} rows")
            diff = [(a, b) for a, b in zip(gc, wc) if a != b][:3]
            for a, b in diff:
                print(f"  spark:  {a}\n  oracle: {b}")
            if len(gc) != len(wc):
                sg, sw = set(gc), set(wc)
                only_g = list(sg - sw)[:2]
                only_w = list(sw - sg)[:2]
                print(f"  only-spark: {only_g}\n  only-oracle: {only_w}")
            n_fail += 1
    # rows-only queries (no oracle)
    for name in sorted(os.listdir(out_dir)):
        p = f"{out_dir}/{name}"
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.execute(
                    f"SELECT COUNT(*) FROM read_parquet('{p}/*.parquet')"
                ).fetchone()[0]
                print(f"ROWSONLY {name} ({n} rows)")
            except Exception as e:
                print(f"ERROR    {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
