"""Local simulation of the driver's correctness gate: run each
queries() entry AND its oracle_sql() twin on the same sf dir, compare
row-count + schema + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
(with query names given, only those entries run; works from any cwd —
the repo root is added to sys.path below)
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
# Ray workers inherit the env, not the driver's sys.path — export it
# before ray.init so map_batches callables unpickle in workers.
os.environ["PYTHONPATH"] = _REPO_ROOT + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

import duckdb
import pandas as pd


def to_pandas(obj):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        df = obj.to_pandas()
        if len(df) == 0 and len(df.columns) == 0:
            # Dataset.to_pandas() drops columns on 0-row results even
            # when the dataset schema is known — rebuild the empty
            # frame from the schema so the comparison sees real columns
            schema = obj.schema()
            base = getattr(schema, "base_schema", None)
            if base is not None:
                df = base.empty_table().to_pandas()
        return df
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        if df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None, skip: dict[str, str] | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if skip and name in skip:
            print(f"{name:24s} SKIP ({skip[name]})")
            continue
        got = canon(to_pandas(fn(sf_dir)))
        if name not in oracles:
            print(f"{name:24s} rows={len(got):6d}  (rows-only, no oracle)")
            continue
        want = canon(con.sql(oracles[name]).df())
        status = []
        if len(got) != len(want):
            status.append(f"ROWS {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"SCHEMA {list(got.columns)} != {list(want.columns)}")
        if not status:
            for c in got.columns:
                g, w = got[c], want[c]
                if g.dtype.kind == "f":
                    exact = (g.values == w.values) | (g.isna() & w.isna()).values
                    if not exact.all():
                        status.append(f"VALUES col={c} ({(~exact).sum()} diffs)")
                else:
                    if not g.equals(w):
                        diffs = (g != w) & ~(g.isna() & w.isna())
                        status.append(f"VALUES col={c} ({diffs.sum()} diffs)")
        tag = "OK " if not status else "FAIL"
        print(f"{name:24s} rows={len(got):6d}  {tag} {'; '.join(status)}")
        if status:
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracled queries match")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2:] or None,
    )
