"""Relational demo pipelines over the TPC-H-ish tables.

The reference has no relational joins (SURVEY.md §2.4) — these exist to
exercise the engine's wide operators (pre-aggregated groupby, broadcast
joins, top-k) with DuckDB-checkable semantics, the way a user of the
engine would compose them.

Patterns:
* pre-aggregate inside map_batches → tiny global groupby (no raw-row
  shuffle);
* dimension tables broadcast via ``ray.put`` once, merged per batch —
  never a shuffle join for a small side.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped rollup on lineitem (pre-aggregated)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = batch.append_column("disc_price", disc_price)
        return pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ("l_quantity", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity_sum", alias_name="sum_qty"),
        Sum("l_extendedprice_sum", alias_name="sum_base_price"),
        Sum("disc_price_sum", alias_name="sum_disc_price"),
        Sum("l_quantity_count", alias_name="count_order"),
    )


def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """orders ⋈ customer ⋈ nation via broadcast dims (customer+nation are
    tiny next to orders): ray.put once, pandas merge per batch."""
    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")[
        ["c_custkey", "n_name"]
    ]
    dim_ref = ray.put(dim)

    class JoinDim:
        def __init__(self):
            self.dim = ray.get(dim_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            j = batch.merge(self.dim, left_on="o_custkey", right_on="c_custkey")
            return (
                j.groupby("n_name", as_index=False)["o_totalprice"]
                .agg(["sum", "count"])
                .rename(columns={"sum": "revenue_part", "count": "n_part"})
            )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(JoinDim, batch_format="pandas", concurrency=2)
    return partials.groupby("n_name").aggregate(
        Sum("revenue_part", alias_name="revenue"),
        Sum("n_part", alias_name="n_orders"),
    )


def top_parts_by_size(sf_dir: str) -> rd.Dataset:
    """Top-10 parts by retail price within large sizes — sort + limit."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    big = parts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("p_size"), 25)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return big.sort(["p_retailprice", "p_partkey"], descending=[True, False]).limit(10)


def supplier_balance_by_region(sf_dir: str) -> rd.Dataset:
    """supplier ⋈ nation ⋈ region → per-region supplier count + total
    account balance. Same broadcast-dims pattern as revenue_by_nation
    (nation+region are tiny); exercises the remaining star-schema tables."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    dim_ref = ray.put(dim)

    class JoinDim:
        def __init__(self):
            self.dim = ray.get(dim_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            j = batch.merge(self.dim, left_on="s_nationkey", right_on="n_nationkey")
            out = j.groupby("r_name", as_index=False)["s_acctbal"].agg(["sum", "count"])
            return out.rename(columns={"sum": "bal_part", "count": "n_part"})

    suppliers = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    partials = suppliers.map_batches(JoinDim, batch_format="pandas", concurrency=2)
    return partials.groupby("r_name").aggregate(
        Sum("bal_part", alias_name="total_balance"),
        Sum("n_part", alias_name="n_suppliers"),
    )


def docs_with_labels(sf_dir: str, num_partitions: int = 8) -> rd.Dataset:
    """documents ⋈ embeddings on doc_id=vec_id via the engine-native
    HASH JOIN (Dataset.join) — the shuffle-join form for when neither
    side is broadcastable (at 100 TB both fact tables are large; the
    broadcast pattern above stops applying)."""
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    emb = _read(sf_dir, "embeddings", ["vec_id", "label"])
    joined = docs.join(
        emb,
        join_type="inner",
        num_partitions=num_partitions,
        on=("doc_id",),
        right_on=("vec_id",),
    )
    return joined.select_columns(["doc_id", "lang", "n_chars", "label"])
