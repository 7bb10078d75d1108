"""Adversarial oracle fuzz: generate a hostile mini-warehouse (nulls,
empty/whitespace/unicode text, exact+near duplicates, boilerplate,
PII, degenerate events, referential dirt) with the exact testdata
schemas, then run EVERY queries()/oracle_sql() pair on it via the
check_oracles comparison — the end-to-end equivalence sweep the
reference skipped (tests/test_core.py:312-345) run under data the
driver's clean tables never exercise.

Usage: PYTHONPATH=/root/repo python tools/fuzz_oracles.py [seed]
"""

from __future__ import annotations

import datetime
import os
import random
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

WORDS = (
    "the quick brown fox jumps over lazy dog alpha beta gamma delta data "
    "pipeline corpus shuffle partition extract turn conv span the of and"
).split()


def _doc_text(rng: random.Random, i: int) -> str | None:
    roll = rng.random()
    if roll < 0.04:
        return None
    if roll < 0.08:
        return ""
    if roll < 0.12:
        return rng.choice([" ", "\t\n", "   \r\n", "-=-=-=", "···", "___"])
    if roll < 0.16:  # CJK / unicode (NFKC-interesting chars included)
        return rng.choice(["漢字 テスト ㌀ ﬁne", "大藏經 寶 言", "変換 あいう ｶﾀｶﾅ"])
    if roll < 0.20:  # PII-rich
        return f"contact bob{i}@example.com or +1 (555) 010-{1000 + i} now {rng.choice(WORDS)}"
    if roll < 0.24:  # layout payload
        lines = ["%LAYOUT"] + [
            f"{rng.randint(0, 50)},{rng.randint(0, 50)},{rng.randint(51, 200)},"
            f"{rng.randint(51, 300)},0.{rng.randint(3, 9)}|line {i} {rng.choice(WORDS)}"
            for _ in range(rng.randint(1, 4))
        ]
        return "\n".join(lines)
    if roll < 0.28:  # html payload
        return (
            f"<p>block {i} {' '.join(rng.choices(WORDS, k=8))}</p>"
            f"<div><a href=x>{' '.join(rng.choices(WORDS, k=3))}</a></div>"
        )
    n = rng.randint(1, 60)
    return " ".join(rng.choices(WORDS, k=n))


def build_warehouse(out_dir: str, seed: int, n_docs: int = 400) -> None:
    rng = random.Random(seed)
    # --- documents: dirt + exact dups + near dups + boilerplate -------
    texts: list[str | None] = [_doc_text(rng, i) for i in range(n_docs)]
    for i in range(0, n_docs, 23):  # exact duplicate pairs
        texts[(i + 7) % n_docs] = texts[i]
    boiler = " ".join(rng.choices(WORDS, k=30))
    for i in range(0, n_docs, 31):  # near-dup family around one template
        texts[i] = boiler + f" tail{i % 3}"
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            # ~4% null lang: a NULL group must ride every lang-grouped
            # aggregate/top-k/rebalance like the oracle's GROUP BY NULL
            "lang": pa.array(
                [
                    None
                    if i % 29 == 3
                    else rng.choice(["en", "de", "fr", "cjk", "other"])
                    for i in range(n_docs)
                ]
            ),
            # ~4% null provenance: source_overlap must drop the null
            # class without tripping any shuffle (round-4e regression)
            "source": pa.array(
                [None if i % 23 == 5 else f"s{i % 5}" for i in range(n_docs)]
            ),
            "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))

    # --- embeddings: clusters + exact-duplicate vectors + zeros -------
    nrng = np.random.RandomState(seed)
    d = 16
    base = nrng.randn(8, d)
    emb = base[nrng.randint(0, 8, size=n_docs)] + nrng.randn(n_docs, d) * 0.05
    emb[5] = emb[9]  # identical vectors (cos ties at the top-k boundary)
    emb[11] = 0.0  # zero vector (norm guard)
    embeddings = pa.table(
        {
            "vec_id": pa.array(range(n_docs), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in emb],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(nrng.randint(0, 5, size=n_docs).astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(embeddings, os.path.join(out_dir, "embeddings.parquet"))

    # --- events: null values, duplicate timestamps, one hot user ------
    n_ev = 3000
    t0 = datetime.datetime(2025, 3, 1)
    users = nrng.randint(0, 40, size=n_ev)
    users[: n_ev // 4] = 7  # skewed hot user
    ts = [t0 + datetime.timedelta(seconds=int(x)) for x in np.sort(nrng.randint(0, 90_000, size=n_ev))]
    # ~3% null event_type: the NULL group must survive every
    # event_type-grouped rollup/sketch/quantile (null_safe_kpart)
    etypes = [
        None
        if i % 37 == 9
        else rng.choice(["view", "click", "purchase", "signup", "error", "heartbeat"])
        for i in range(n_ev)
    ]
    # 4-decimal money: off the cent grid, so rounding boundaries
    # carry real probability mass (the order-sensitivity trap)
    vals = np.round(nrng.gamma(2.0, 8.0, size=n_ev), 4)
    null_mask = nrng.rand(n_ev) < 0.07
    # null partition/window keys (round-4e): ~3% null users and ~2%
    # null timestamps — the hourly rollups keep a NULL window (the
    # oracle's count-distinct emits (hour, 0) for all-null-user hours)
    # while the user-partitioned ops drop them by documented contract
    events = pa.table(
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(
                [None if i % 47 == 11 else t for i, t in enumerate(ts)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(
                [None if i % 31 == 4 else int(u) for i, u in enumerate(users)],
                pa.int64(),
            ),
            "event_type": pa.array(etypes),
            # 'heartbeat' events: value always NULL and props never
            # carry k — an ALL-NULL aggregate group on every rollup
            "value": pa.array(
                [None if (m or e == "heartbeat") else float(v)
                 for m, v, e in zip(null_mask, vals, etypes)],
                pa.float64(),
            ),
            "props": pa.array(
                [
                    "{}" if e == "heartbeat"
                    else rng.choice(['{"k": 3}', '{"k": 17}', "{}", '{"other": 1}'])
                    for e in etypes
                ]
            ),
        }
    )
    pq.write_table(events, os.path.join(out_dir, "events.parquet"))

    # --- TPC-H-ish dims/facts with referential dirt -------------------
    region = pa.table(
        {"r_regionkey": pa.array(range(5), pa.int32()),
         "r_name": pa.array([f"R{i}" for i in range(5)])}
    )
    pq.write_table(region, os.path.join(out_dir, "region.parquet"))
    nation = pa.table(
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": pa.array([f"N{i}" for i in range(25)]),
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }
    )
    pq.write_table(nation, os.path.join(out_dir, "nation.parquet"))
    n_cust = 300
    customer = pa.table(
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(n_cust)]),
            "c_nationkey": pa.array([i % 25 for i in range(n_cust)], pa.int32()),
            "c_acctbal": pa.array(np.round(nrng.rand(n_cust) * 1000, 2)),
            "c_mktsegment": pa.array([rng.choice(["A", "B"]) for _ in range(n_cust)]),
        }
    )
    pq.write_table(customer, os.path.join(out_dir, "customer.parquet"))
    n_supp = 60
    supplier = pa.table(
        {
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": pa.array([f"s{i}" for i in range(n_supp)]),
            "s_nationkey": pa.array([i % 25 for i in range(n_supp)], pa.int32()),
            "s_acctbal": pa.array(np.round(nrng.rand(n_supp) * 900 - 100, 2)),
        }
    )
    pq.write_table(supplier, os.path.join(out_dir, "supplier.parquet"))
    n_part = 500
    part = pa.table(
        {
            "p_partkey": pa.array(range(n_part), pa.int64()),
            "p_name": pa.array([f"p{i}" for i in range(n_part)]),
            "p_brand": pa.array([f"B{i % 9}" for i in range(n_part)]),
            "p_type": pa.array([f"T{i % 7}" for i in range(n_part)]),
            "p_size": pa.array(nrng.randint(1, 51, size=n_part).astype(np.int32), pa.int32()),
            # duplicate retail prices force top-k tie-breaks
            "p_retailprice": pa.array(np.round(nrng.randint(0, 9) * 250 + nrng.rand(n_part) * 250, 2)),
        }
    )
    pq.write_table(part, os.path.join(out_dir, "part.parquet"))
    n_ord = 1200
    orders = pa.table(
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(nrng.randint(0, n_cust, size=n_ord), pa.int64()),
            "o_orderstatus": pa.array([rng.choice(["O", "F"]) for _ in range(n_ord)]),
            "o_totalprice": pa.array(np.round(nrng.rand(n_ord) * 5000, 2)),
            "o_orderdate": pa.array(
                [t0 + datetime.timedelta(days=int(x)) for x in nrng.randint(0, 300, size=n_ord)],
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array([rng.choice(["1", "2", "3"]) for _ in range(n_ord)]),
        }
    )
    pq.write_table(orders, os.path.join(out_dir, "orders.parquet"))
    n_li = 2000
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(nrng.randint(0, n_ord, size=n_li), pa.int64()),
            "l_partkey": pa.array(nrng.randint(0, n_part, size=n_li), pa.int64()),
            "l_suppkey": pa.array(nrng.randint(0, n_supp, size=n_li), pa.int64()),
            "l_linenumber": pa.array((nrng.randint(1, 8, size=n_li)).astype(np.int32), pa.int32()),
            "l_quantity": pa.array(np.round(nrng.rand(n_li) * 50, 3)),
            "l_extendedprice": pa.array(np.round(nrng.rand(n_li) * 10_000, 3)),
            "l_discount": pa.array(np.round(nrng.rand(n_li) * 0.1, 2)),
            "l_tax": pa.array(np.round(nrng.rand(n_li) * 0.08, 2)),
            "l_returnflag": pa.array([rng.choice(["A", "N", "R"]) for _ in range(n_li)]),
            "l_linestatus": pa.array([rng.choice(["O", "F"]) for _ in range(n_li)]),
            "l_shipdate": pa.array(
                [t0 + datetime.timedelta(days=int(x)) for x in nrng.randint(0, 300, size=n_li)],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(lineitem, os.path.join(out_dir, "lineitem.parquet"))


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1234
    from check_oracles import main as check

    # The flagship full-row oracle's documented domain is the driver's
    # tag-free pure-ASCII documents corpora: on this warehouse the html
    # rows (boilerplate strip not generically SQL-expressible — covered
    # by the html_extract derivation oracle) and NFKC-active unicode
    # rows (DuckDB has no NFKC) mismatch BY DESIGN (loud-NULL / identity
    # trim). Key-aligned route/status/error stay exact even here — see
    # tests/test_full_oracle.py for the in-domain all-branch sweep.
    skip = {
        "extract_transcripts": "domain: ASCII tag-free corpora "
        "(html/NFKC rows mismatch loudly by design)"
    }
    with tempfile.TemporaryDirectory(prefix="ior_fuzz_") as tmp:
        build_warehouse(tmp, seed)
        check(tmp, skip=skip)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
