#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output against
DuckDB oracles and compare values. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v  # exact: assume the driver compares values bit-for-bit
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v

def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return [cols[i] for i in order], data

def types_of(con, sql):
    """name -> DuckDB type string, via DESCRIBE. The driver's hash compare is
    TYPE-sensitive (HUGEINT vs BIGINT broke 7 queries in round 1), so the
    local gate must be too."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # directory-table layout (e.g. the generated sf1 sweep data:
            # one file per replica) — glob the parts for DuckDB
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = ok = 0
    # a query that FAILED in graft.Verify has no output dir — surface it
    # instead of silently skipping (a stale-or-absent dir must never pass)
    ep = f"{out_dir}/verify_errors.json"
    reported = set()
    if os.path.exists(ep):
        for name, err in json.load(open(ep)).items():
            if not only or name in only:
                print(f"  {name}: VERIFY FAILED: {err[:160]}")
                fails += 1; reported.add(name)
    present = {os.path.basename(d.rstrip("/"))
               for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(oracles):
        if (not only or name in only) and name not in present \
                and name not in reported:
            print(f"  {name}: MISSING OUTPUT"); fails += 1
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if only and name not in only:
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT"); fails += 1; continue
        spark_cols, spark_rows = rows_of(
            con.execute(f"SELECT * FROM read_parquet({files!r})"))
        if name not in oracles:
            print(f"  {name}: rows-only ({len(spark_rows)} rows)"
                  + (" EMPTY!" if not spark_rows else ""))
            fails += 0 if spark_rows else 1
            continue
        try:
            o_cols, o_rows = rows_of(con.execute(oracles[name]))
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
        if spark_cols != o_cols:
            print(f"  {name}: COLUMN MISMATCH spark={spark_cols} oracle={o_cols}")
            fails += 1; continue
        s_types = types_of(con, f"SELECT * FROM read_parquet({files!r})")
        o_types = types_of(con, oracles[name])
        bad = {c: (s_types.get(c), o_types.get(c))
               for c in s_types if s_types.get(c) != o_types.get(c)}
        if bad:
            print(f"  {name}: TYPE MISMATCH {bad} — cast the oracle")
            fails += 1; continue
        if spark_rows == o_rows:
            print(f"  {name}: OK ({len(spark_rows)} rows)"); ok += 1
        elif sorted(map(repr, spark_rows)) == sorted(map(repr, o_rows)):
            print(f"  {name}: OK-unordered ({len(spark_rows)} rows) "
                  f"— add matching ORDER BY"); ok += 1
        else:
            print(f"  {name}: VALUE MISMATCH rows {len(spark_rows)} vs {len(o_rows)}")
            sset, oset = set(map(repr, spark_rows)), set(map(repr, o_rows))
            for r in list(sset - oset)[:3]: print(f"    spark-only: {r[:200]}")
            for r in list(oset - sset)[:3]: print(f"    oracle-only: {r[:200]}")
            fails += 1
    print(f"{ok} ok, {fails} failed")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
