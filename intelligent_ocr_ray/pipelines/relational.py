"""Relational demo pipelines over the TPC-H-ish tables.

The reference has no relational joins (SURVEY.md §2.4) — these exist to
exercise the engine's wide operators (pre-aggregated groupby, broadcast
joins, top-k) with DuckDB-checkable semantics, the way a user of the
engine would compose them.

Patterns:
* pre-aggregate inside map_batches → tiny global groupby (no raw-row
  shuffle);
* genuinely tiny dimensions (nation: 25 rows, region: 5 — FIXED size,
  not ×sf) become dense int-key lookup arrays applied per Arrow batch;
* fact-scale sides (orders ⋈ customer) use the engine-native hash join
  (Dataset.join) — never a broadcast that grows with sf.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd



def _read(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    *,
    rows_per_block: int = 262_144,
    min_blocks: int = 8,
) -> rd.Dataset:
    """Metadata-sized read (~256k narrow fact rows per block; io_utils
    rationale — the shuffle pays per block PAIR)."""
    from ..io_utils import sized_read_parquet

    return sized_read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns,
        rows_per_block=rows_per_block, min_blocks=min_blocks,
    )


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped rollup on lineitem (pre-aggregated).

    Money is fixed-point from the first touch: each value rounds
    half-even to integer units (quantity/base price → cents; the
    4-decimal extendedprice×(1−discount) product → MICROS) and only
    integers are summed. A float sum rounded at the end is
    summation-order-sensitive, and a 4-decimal product sum lands
    EXACTLY on a half-cent boundary with probability ≈0.1 per group —
    there the two engines' different addition orders pick opposite
    sides. Per-value integerization is order-free and exact on both."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    from ..io_utils import money_units

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_cents": money_units(batch.column("l_quantity")),
                "base_cents": money_units(batch.column("l_extendedprice")),
                "disc_micros": money_units(disc_price, 1_000_000.0),
            }
        )
        return pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_cents", "sum"), ("base_cents", "sum"), ("disc_micros", "sum"),
             ([], "count_all")]
        )

    from ..io_utils import null_safe_grouped_sum

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_grouped_sum(
        partials,
        ["l_returnflag", "l_linestatus"],
        [
            ("qty_cents_sum", "sum_qty_cents"),
            ("base_cents_sum", "sum_base_price_cents"),
            ("disc_micros_sum", "sum_disc_price_micros"),
            ("count_all", "count_order"),
        ],
    )


def _key_lookup(keys: "pa.Array | pa.ChunkedArray", values) -> "tuple":
    """Dense int-key → value lookup table from a tiny dimension table
    (TPC-H keys are small dense ints). Returns (np value array, offset,
    valid mask): slots absent from the dimension are marked invalid so a
    fact row referencing them is DROPPED (inner-join semantics) rather
    than mapped to garbage; fact keys outside [lo, hi] must be dropped
    by the caller via :func:`_lookup_take` too."""
    import numpy as np

    k = np.asarray(keys, dtype=np.int64)
    lo, hi = int(k.min()), int(k.max())
    vals = np.asarray(values.to_pylist() if hasattr(values, "to_pylist") else values)
    table = np.zeros(hi - lo + 1, dtype=vals.dtype)
    valid = np.zeros(hi - lo + 1, dtype=bool)
    table[k - lo] = vals
    valid[k - lo] = True
    return table, lo, valid


def _lookup_take(fact_keys, table, lo, valid) -> "tuple":
    """Inner-join a fact-side int key column against a dense lookup:
    returns (keep_indices, mapped_values) with out-of-range and
    absent-key rows dropped — never uninitialized reads, never
    IndexError on referential-integrity violations."""
    import numpy as np

    nk = np.asarray(fact_keys, dtype=np.int64)
    in_range = (nk >= lo) & (nk < lo + len(table))
    idx = np.where(in_range, nk - lo, 0)
    keep = np.flatnonzero(in_range & valid[idx])
    return keep, table[nk[keep] - lo]


def revenue_by_nation(sf_dir: str, num_partitions: int = 8) -> rd.Dataset:
    """orders ⋈ customer via the engine-native HASH JOIN (both are
    fact-scale tables — customer is 1.5 M rows × sf, NOT a broadcastable
    side at 100×), then nation (25 rows — genuinely tiny) attached as a
    broadcast lookup inside an Arrow partial aggregate. No pandas
    anywhere; the global groupby only sees per-batch partials."""
    import numpy as np
    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_name"]
    )
    names, off, nvalid = _key_lookup(nation.column("n_nationkey"), nation.column("n_name"))

    def partial(batch: pa.Table) -> pa.Table:
        keep, mapped = _lookup_take(batch.column("c_nationkey"), names, off, nvalid)
        from ..io_utils import money_units

        cents = money_units(batch.column("o_totalprice").take(pa.array(keep)))
        t = pa.table({"n_name": pa.array(mapped, pa.string()), "cents": cents})
        return pa.TableGroupBy(t, ["n_name"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )

    from ..io_utils import null_safe_grouped_sum

    partials = joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_grouped_sum(
        partials,
        ["n_name"],
        [("cents_sum", "revenue_cents"), ("count_all", "n_orders")],
    )


def top_parts_by_size(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Top-k parts by retail price within large sizes — partial top-k
    per batch → one tiny k×n_blocks merge. No global sort: a range
    shuffle of the whole filtered fact table for a 10-row answer is an
    all-to-all the TopKPartial pattern (stages/similarity.py) makes
    unnecessary; here only ≤ k rows leave each block."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    keys = [("p_retailprice", "descending"), ("p_partkey", "ascending")]

    def topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=keys)
        return t.take(order.slice(0, k))

    def partial(t: pa.Table) -> pa.Table:
        return topk(t.filter(pc.greater_equal(t.column("p_size"), 25)))

    partials = parts.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # single-block merge of the ≤ k-per-block partials (narrow move);
    # batch_size=None pins whole-block batching so the merge sees ALL
    # candidates in one call — a fixed default batch row-count would
    # silently emit k rows per SLICE instead of k total (ADVICE r3)
    return partials.repartition(1).map_batches(
        topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def supplier_balance_by_region(sf_dir: str) -> rd.Dataset:
    """supplier ⋈ nation ⋈ region → per-region supplier count + total
    account balance. nation (25) ⋈ region (5) really ARE broadcast-small
    dimensions: pre-joined on the driver with Arrow's Table.join into a
    nationkey → region-name lookup attached inside an Arrow partial
    aggregate per supplier batch. No pandas anywhere."""
    import numpy as np
    import pyarrow.parquet as pq

    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    dim = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    rnames, off, rvalid = _key_lookup(dim.column("n_nationkey"), dim.column("r_name"))

    def partial(batch: pa.Table) -> pa.Table:
        keep, mapped = _lookup_take(batch.column("s_nationkey"), rnames, off, rvalid)
        from ..io_utils import money_units

        cents = money_units(batch.column("s_acctbal").take(pa.array(keep)))
        t = pa.table({"r_name": pa.array(mapped, pa.string()), "cents": cents})
        return pa.TableGroupBy(t, ["r_name"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )

    from ..io_utils import null_safe_grouped_sum

    suppliers = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    partials = suppliers.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_grouped_sum(
        partials,
        ["r_name"],
        [("cents_sum", "total_balance_cents"), ("count_all", "n_suppliers")],
    )


def broadcast_range_join(
    ds: rd.Dataset,
    ranges: list[tuple[int, float, float]],
    value_col: str,
    keep_cols: list[str],
) -> rd.Dataset:
    """RANGE (interval) JOIN — a custom operator Ray Data lacks: match
    each row's ``value_col`` to every range ``[lo, hi)`` in a SMALL
    ranges side (one-to-many; ranges may overlap). The ranges ride in
    the task closure (broadcast side, a handful of floats); the match is
    one vectorized mask per range per batch — no shuffle at all. For a
    LARGE ranges side the scale path is an interval partition of the
    value axis + a hash join per partition, the same coarse-partition
    discipline as the dedup pipelines."""
    import numpy as np

    def match(t: pa.Table) -> pa.Table:
        vals = np.asarray(t.column(value_col), dtype=np.float64)
        idx_parts: list[np.ndarray] = []
        band_parts: list[np.ndarray] = []
        for band_id, lo, hi in ranges:
            hit = np.flatnonzero((vals >= lo) & (vals < hi))
            idx_parts.append(hit)
            band_parts.append(np.full(len(hit), band_id, dtype=np.int64))
        idx = np.concatenate(idx_parts) if idx_parts else np.array([], dtype=np.int64)
        take = pa.array(idx)
        out = {c: t.column(c).take(take) for c in keep_cols}
        out["band_id"] = pa.array(
            np.concatenate(band_parts) if band_parts else np.array([], dtype=np.int64),
            pa.int64(),
        )
        return pa.table(out)

    return ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)


def parts_in_price_bands(sf_dir: str) -> rd.Dataset:
    """Overlapping price-band interval join over `part` (bands of width
    500 stepping by 250 — each price hits one or two bands)."""
    bands = [(i, i * 250.0, i * 250.0 + 500.0) for i in range(10)]
    parts = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])
    joined = broadcast_range_join(
        parts, bands, "p_retailprice", ["p_partkey", "p_retailprice"]
    )

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(t.column("p_retailprice"), 100.0), ndigits=0),
            pa.int64(),
        )
        return pa.table(
            {
                "p_partkey": t.column("p_partkey"),
                "band_id": t.column("band_id"),
                "price_cents": c,
            }
        )

    return joined.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)


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
