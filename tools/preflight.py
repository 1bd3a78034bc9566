#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Runs each oracleSql entry in DuckDB against the same sf tables, loads the
Spark parquet dump written by graft.Verify, and compares row counts,
column names/dtypes, and values (exact; doubles report max-abs-diff when
not bit-equal). Usage:

    python3 tools/preflight.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return v
    return v


def cmp_cell(a, b):
    import datetime
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        return a == b, abs(a - b)
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False, float("inf")
        ok, mx = True, 0.0
        for x, y in zip(a, b):
            o, d = cmp_cell(x, y)
            ok = ok and o
            mx = max(mx, d)
        return ok, mx
    return a == b, 0.0 if a == b else float("inf")


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            dk = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
            ).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: spark dump missing/unreadable: {e}")
            n_fail += 1
            continue
        cols_d = sorted(dk.column_names)
        cols_s = sorted(sp.column_names)
        if cols_d != cols_s:
            print(f"FAIL {name}: columns differ duckdb={cols_d} spark={cols_s}")
            n_fail += 1
            continue
        if dk.num_rows != sp.num_rows:
            print(f"FAIL {name}: rows duckdb={dk.num_rows} spark={sp.num_rows}")
            n_fail += 1
            continue
        # dtype check (loose: arrow type string)
        dt_d = {c: str(dk.schema.field(c).type) for c in cols_d}
        dt_s = {c: str(sp.schema.field(c).type) for c in cols_s}
        dtype_mismatch = {c: (dt_d[c], dt_s[c]) for c in cols_d if dt_d[c] != dt_s[c]}
        dkp = dk.to_pylist()
        spp = sp.to_pylist()
        bad = 0
        maxdiff = 0.0
        first = None
        for i, (r1, r2) in enumerate(zip(dkp, spp)):
            for c in cols_d:
                ok, d = cmp_cell(r1[c], r2[c])
                if not ok:
                    bad += 1
                    maxdiff = max(maxdiff, d)
                    if first is None:
                        first = (i, c, r1[c], r2[c])
        if bad == 0:
            note = f" (dtype note: {dtype_mismatch})" if dtype_mismatch else ""
            print(f"PASS {name}: {dk.num_rows} rows{note}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {bad} cell mismatches, maxdiff={maxdiff:.3e}, "
                  f"first={first}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
