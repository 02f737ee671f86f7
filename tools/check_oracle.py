#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare to the Spark parquet dumped by
graft.Verify (row count, schema (sorted col names), and value hash with
columns sorted by name). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import sys, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    # Type-faithful, like the driver: a DuckDB decimal128 (e.g. SUM(BIGINT))
    # must NOT silently compare equal to a Spark int64 — tag non-int exact
    # numerics so a type mismatch fails here exactly as it fails the driver.
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    return str(v)

def frame_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            fail += 1
            continue
        spark_tbl = pq.read_table(f"{out_dir}/{name}")
        s_cols = list(spark_tbl.column_names)
        s_rows = [tuple(r.values()) for r in spark_tbl.to_pylist()]
        try:
            cur = con.execute(sql)
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {e}")
            fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems and frame_hash(s_cols, s_rows) != frame_hash(d_cols, d_rows):
            problems.append("value hash mismatch")
            pairs = list(zip(sorted(s_rows), sorted(d_rows)))[:3]
            for a, b in pairs:
                if a != b:
                    problems.append(f"  spark={a} duck={b}")
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems[:4]))
            fail += 1
        else:
            print(f"[ OK ] {name} ({len(s_rows)} rows)")
            ok += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
