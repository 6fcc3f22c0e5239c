#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle on the same tables and diff them cell-exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    # floats: exact repr; Decimal: normalized; timestamps/dates: isoformat
    import decimal, datetime
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_rows(names, cols):
    order = sorted(range(len(names)), key=lambda i: names[i])
    names_sorted = [names[i] for i in order]
    cols_sorted = [cols[i] for i in order]
    rows = sorted(tuple(canon(c[r]) for c in cols_sorted)
                  for r in range(len(cols_sorted[0]) if cols_sorted else 0))
    return names_sorted, rows


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
            tbl = pq.read_table(pdir)
            s_names = tbl.column_names
            s_cols = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
            res = con.execute(sql)
            d_names = [c[0] for c in res.description]
            d_rows_raw = res.fetchall()
            d_cols = [[r[i] for r in d_rows_raw] for i in range(len(d_names))]
            sn, sr = frame_rows(s_names, s_cols)
            dn, dr = frame_rows(d_names, d_cols)
            if sn != dn:
                print(f"FAIL {name}: schema {sn} != {dn}")
                n_fail += 1
            elif sr != dr:
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
                print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}, "
                      f"{len(diffs)} diffs; first: "
                      f"{diffs[0] if diffs else (sr[-1] if len(sr)>len(dr) else dr[-1], '<missing>')}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(sr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
