#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each Verify parquet dump in <outDir>/<name>/, runs the matching
oracle SQL from <outDir>/oracle_sql.json against DuckDB views over the
<sfDir> parquet tables, and compares (column names sorted, rows sorted,
values normalized to strings).
"""
import sys, json, glob
from decimal import Decimal
import duckdb
import pyarrow.parquet as pq
import pyarrow.types as pa_types

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return str(v)
    return str(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = [tuple(norm(col[i]) for col in data) for i in range(tbl.num_rows)]
    return cols, sorted(rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # The byte-level oracle replays (checksum_bsd, fingerprint,
    # dedup_minhash/simhash FNV-1a folds) emulate the kernels' per-char
    # arithmetic with ord(char) == byte, which holds ONLY while the corpus
    # is pure ASCII (the xor trick touches just the low 7 bits). Fail
    # loudly at the assumption, not downstream as an opaque hash mismatch.
    non_ascii = con.execute(
        "SELECT count(*) FROM documents WHERE NOT regexp_matches(text, '^[\\x00-\\x7f]*$')"
    ).fetchone()[0]
    if non_ascii:
        print(f"FAIL ascii-guard: {non_ascii} documents contain non-ASCII chars; "
              "the FNV-1a/byte-fold oracle emulations are invalid on this corpus")
        sys.exit(1)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(f"{out_dir}/{name}")
        try:
            duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # The driver's hash gate mismatches on decimal-typed columns (r2:
        # every decimal/HUGEINT-output query failed hash_match while all
        # DOUBLE/BIGINT/STRING outputs passed) — so hostile types are a
        # local FAIL even when the values compare equal below.
        hostile = [f"{side}.{fld.name}:{fld.type}"
                   for side, tbl in (("spark", spark_tbl), ("duck", duck_tbl))
                   for fld in tbl.schema
                   if pa_types.is_decimal(fld.type)]
        if hostile:
            print(f"FAIL {name}: driver-hostile output types {hostile}")
            n_fail += 1
            continue
        sc, sr = table_rows(spark_tbl)
        dc, dr = table_rows(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            for a in sr[:3]:
                print("  spark:", a)
            for b in dr[:3]:
                print("  duck :", b)
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; cols={sc}; first:")
            for a, b in bad[:3]:
                print("  spark:", a)
                print("  duck :", b)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
