#!/usr/bin/env python3
"""Driver-hash type audit: catch oracle/Spark result-TYPE divergence that
cell-value comparison (tools/check.py) cannot see.

The driver's comparator hashes canonicalized values, and its
canonicalization of Arrow decimal128 differs from int64 — so a DuckDB
statement returning HUGEINT (e.g. sum(BIGINT)) against a Spark BIGINT
column passes check.py yet fails the driver gate (the a_rfm r06/r07
lesson). This tool runs every oracle statement through DuckDB's Arrow
path and compares the result schema column-by-column against the Spark
parquet dump's schema, failing on any cross-family pair — in particular
decimal128 (HUGEINT) vs integer.

Usage: python3 tools/typecheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def family(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list<" + family(t.value_type) + ">"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = f"{out_dir}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            s_schema = pq.read_schema(glob.glob(f"{pdir}/*.parquet")[0])
            # LIMIT 0 is not enough: DuckDB still types the projection, but
            # keep the full result to match the driver's actual execution.
            d_schema = con.execute(sql).arrow().schema
            s_types = {f.name: f.type for f in s_schema}
            d_types = {f.name: f.type for f in d_schema}
            bad = []
            for col, dt in d_types.items():
                st = s_types.get(col)
                if st is None:
                    continue  # schema mismatch is check.py's job
                sf, df = family(st), family(dt)
                if sf != df:
                    bad.append(f"{col}: spark={st} ({sf}) vs duckdb={dt} ({df})")
            if bad:
                print(f"FAIL {name}: " + "; ".join(bad))
                n_fail += 1
            else:
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} type-clean, {n_fail} flagged")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
