#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry (views registered over the
same parquet tables), loads the Spark result parquet written by
graft.Verify, canonicalizes both (columns sorted by name, rows sorted),
and compares values. Usage:

    python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_family(dt) -> str:
    """Repr-class of a pandas dtype. The driver's hash is repr-sensitive
    (int64 361 vs float64 361.0 mismatch), so two frames must agree on
    the FAMILY even when every value is numerically equal. Width
    differences inside a family (int32 vs int64) repr identically and
    are allowed."""
    import pandas.api.types as pt
    if pt.is_bool_dtype(dt):
        return "bool"
    if pt.is_integer_dtype(dt):
        return "int"
    if pt.is_float_dtype(dt):
        return "float"
    if pt.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


# DuckDB output types that pandas cannot materialize faithfully:
# HUGEINT (uncast sum() over integers) and DECIMAL both land as
# float64/object and hash-diverge from Spark's int64 even when values
# match — the q12/q18/tx_sft_format class from round 9. Always a bug in
# the oracle SQL (missing ::BIGINT), never acceptable.
def bad_oracle_types(rel) -> list:
    out = []
    for col_name, t in zip(rel.columns, rel.types):
        ts = str(t).upper()
        if ts == "HUGEINT" or ts.startswith("DECIMAL"):
            out.append((col_name, ts))
    return out


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            hugeints = bad_oracle_types(rel)
            want = canon(rel.df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if hugeints:
            print(f"FAIL {name}: oracle output columns not pandas-safe "
                  f"(cast to ::BIGINT): {hugeints}")
            n_fail += 1
            continue
        try:
            import glob
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            got = canon(pq.ParquetDataset(files).read().to_pandas())
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        fam_bad = [
            (c, str(got[c].dtype), str(want[c].dtype))
            for c in got.columns
            if dtype_family(got[c].dtype) != dtype_family(want[c].dtype)
        ]
        if fam_bad:
            print(f"FAIL {name}: dtype divergence (spark vs duckdb): "
                  f"{fam_bad}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                ga, wa = got[c].iloc[i], want[c].iloc[i]
                if not values_equal(ga, wa):
                    bad = (i, c, ga, wa)
                    break
            if bad:
                break
        if bad:
            i, c, ga, wa = bad
            print(f"FAIL {name}: row {i} col {c}: spark={ga!r} duckdb={wa!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
