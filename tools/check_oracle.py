#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs each oracle SQL from outDir/oracle_sql.json in DuckDB against the
same parquet test tables, loads the Spark-written result parquet, and
compares (column-name-sorted, row-sorted, float-rounded) values.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 4)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return norm_cell(float(v))
    except ImportError:
        pass
    if isinstance(v, pd.Timestamp):
        return str(v)
    return v


def nested_cols(df: pd.DataFrame):
    import numpy as np
    out = []
    for c in df.columns:
        col = df[c].dropna()
        if len(col) and isinstance(col.iloc[0], (list, tuple, dict, np.ndarray)):
            out.append(c)
    return out


def norm_df(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = []
    for _, row in df[cols].iterrows():
        rows.append(tuple(norm_cell(v) for v in row))
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in sorted(res_dir.glob("*.parquet"))],
                ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        # The DRIVER comparator sorts frames with pandas sort_values,
        # which dies on array/struct cells (unhashable numpy.ndarray) —
        # round-7's q_bpe_encode/q_hash_embed escaped local green that
        # way. Fail loudly on any nested cell so local green predicts
        # driver green: registered queries must serialize arrays
        # (array_join / per-dim scalar columns).
        nested = nested_cols(spark_df) + nested_cols(duck_df)
        if nested:
            print(f"FAIL {name}: array/struct output columns {sorted(set(nested))} "
                  "(driver comparator cannot sort these - serialize them)")
            n_fail += 1
            continue
        sc, sr = norm_df(spark_df)
        dc, dr = norm_df(duck_df)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
