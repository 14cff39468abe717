"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin side-by-side on
one sf dir, compares row count, column names/dtypes, and (order-insensitively)
the values. Usage: ``python tools/check_queries.py [sf_dir] [name ...]``.
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(ray_df.columns) != sorted(ora_df.columns):
        errs.append(f"columns: ray={sorted(ray_df.columns)} oracle={sorted(ora_df.columns)}")
        return errs
    if len(ray_df) != len(ora_df):
        errs.append(f"rows: ray={len(ray_df)} oracle={len(ora_df)}")
    a, b = normalize(ray_df), normalize(ora_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                ok = np.allclose(a[c].fillna(-1e300), b[c].fillna(-1e300), rtol=0, atol=0)
                exact = (a[c].fillna(-1e300) == b[c].fillna(-1e300)).all()
                if not ok:
                    errs.append(f"float col {c} differs")
                elif not exact:
                    errs.append(f"float col {c}: close but NOT bit-equal (hash risk)")
            else:
                eq = (a[c].fillna("\0NULL") == b[c].fillna("\0NULL")) | (
                    a[c].isna() & b[c].isna()
                )
                if not eq.all():
                    i = int(np.flatnonzero(~eq.to_numpy())[0])
                    errs.append(
                        f"col {c} differs at sorted row {i}: ray={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
                    )
        # dtype check (schema strictness)
        for c in a.columns:
            if str(ray_df[sorted(ray_df.columns)].dtypes[c]) != str(
                ora_df[sorted(ora_df.columns)].dtypes[c]
            ):
                errs.append(
                    f"dtype {c}: ray={ray_df[sorted(ray_df.columns)].dtypes[c]} "
                    f"oracle={ora_df[sorted(ora_df.columns)].dtypes[c]} (may be benign)"
                )
    return errs


def main() -> int:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = E.queries(), E.oracle_sql()
    n_fail = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            n_fail += 1
            report[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "err": f"ray error: {type(e).__name__}: {e}",
            }
            continue
        t1 = time.time()
        if name not in os_:
            print(f"pass {name}: rows-only ({len(ray_df)} rows, {t1-t0:.1f}s ray)")
            report[name] = {
                "mode": "rows_only",
                "rows_match": True,
                "spark_rows": int(len(ray_df)),
                "err": None,
            }
            continue
        try:
            ora_df = con.execute(os_[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            report[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "err": f"oracle error: {type(e).__name__}: {e}",
            }
            continue
        errs = compare(name, ray_df, ora_df)
        hard = [e for e in errs if "may be benign" not in e and "hash risk" not in e]
        status = "FAIL" if hard else ("warn" if errs else "ok  ")
        if hard:
            n_fail += 1
        report[name] = {
            "rows_match": len(ray_df) == len(ora_df),
            "schema_match": not any(e.startswith(("columns:", "dtype")) for e in hard),
            "hash_match": not hard,
            "spark_rows": int(len(ray_df)),
            "oracle_rows": int(len(ora_df)),
            "err": "; ".join(hard) or None,
            **({"warnings": errs} if errs and not hard else {}),
        }
        print(
            f"{status} {name}: {len(ray_df)} rows, ray {t1-t0:.1f}s, oracle {time.time()-t1:.1f}s"
            + ("".join(f"\n      - {e}" for e in errs) if errs else "")
        )
    ray.shutdown()
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": report}, f, indent=1)
        print(f"wrote {json_path} ({len(report)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
