"""Deterministic synthetic transcript tables (FIXTURES.md §1-2).

Two generators:

* :func:`generate_transcripts` — the engine's own fixture generator:
  seeded, mixes the FIXTURES.md §2 payload classes (plain, plain_long,
  blank, html, pdfish, variant_cjk, low_conf, nfkc, poison, mega_conv,
  dup_turn) with fixed per-conversation RNG streams so any subset of
  conversations is reproducible independently of generation order.

* :func:`transcripts_from_documents` — derives a transcripts table from
  the driver's pre-built ``documents`` parquet with a transform simple
  enough to re-express in DuckDB SQL (``SQL_DERIVATION``), so oracle
  queries can run against the exact same logical input.

No wall-clock anywhere: timestamps are a fixed epoch plus the turn
index (FIXTURES.md: "seeded/deterministic; no wall-clock").
"""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

_EPOCH = datetime.datetime(2025, 1, 1, 0, 0, 0)

_WORDS = (
    "data stream batch arrow block shuffle actor pool turn span text "
    "layout column vertical reading order variant canonical quality "
    "token window partition manifest resume lineage metric audit"
).split()

_CJK_SENTENCES = [
    "大蔵經の研究を続ける",
    "旧字体の変換規則",
    "竜と鉄の時代",
    "学問のすすめ",
    "広い国の歴史",
    "芸術と文学の関係",
]

_NFKC_SAMPLES = [
    "ＡＢＣ１２３　ﬁﬂ ㎏㎞",
    "Ｈｅｌｌｏ　Ｗｏｒｌｄ ㌀",
    "①②③ Ⅳ Ⅴ ﬀ",
]

_BLANKS = ["", "   ", "\t\n ", "----", "····", "====", "~~~~", "• • •"]

PAYLOAD_CLASSES = (
    "plain",
    "plain_long",
    "blank",
    "html",
    "pdfish",
    "variant_cjk",
    "low_conf",
    "nfkc",
    "poison",
)

# Weights sum to 100; plain-ish payloads dominate like real transcripts.
_WEIGHTS = (25, 20, 8, 15, 15, 6, 4, 4, 3)

_ROLES = ("user", "assistant", "tool", "assistant")


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _payload(rng: random.Random, cls: str) -> str:
    if cls == "plain":
        return _sentence(rng, rng.randrange(2, 6))  # well under 50 chars
    if cls == "plain_long":
        return _sentence(rng, rng.randrange(12, 40)) + "."
    if cls == "blank":
        return rng.choice(_BLANKS)
    if cls == "html":
        main = _sentence(rng, rng.randrange(10, 25))
        side = _sentence(rng, rng.randrange(8, 16))
        nav = "".join(
            f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_WORDS, 5)
        )
        footer = " ".join(
            f'<a href="/{w}">{w} link</a>' for w in rng.sample(_WORDS, 4)
        )
        return (
            f"<html><body><nav><ul>{nav}</ul></nav>"
            f"<div>{main}</div><p>{side}</p>"
            f"<footer>{footer}</footer></body></html>"
        )
    if cls == "pdfish":
        lines = ["%LAYOUT"]
        y = 10.0
        for _ in range(rng.randrange(2, 5)):
            w = rng.randrange(100, 300)
            lines.append(
                f"10,{y:.1f},{10 + w},{y + 12:.1f},{rng.uniform(0.6, 1.0):.2f}|"
                f"{_sentence(rng, rng.randrange(3, 8))}"
            )
            y += 20.0
        # one vertical CJK column (height > 2x width), placed to the right
        lines.append(
            f"400,10,420,200,{rng.uniform(0.6, 1.0):.2f}|{rng.choice(_CJK_SENTENCES)}"
        )
        # one low-confidence line that the filter must drop
        lines.append(f"10,{y:.1f},200,{y + 12:.1f},0.30|noise {_sentence(rng, 2)}")
        return "\n".join(lines)
    if cls == "variant_cjk":
        return rng.choice(_CJK_SENTENCES)
    if cls == "low_conf":
        # all spans below min_confidence → empty extraction, status ok
        return "%LAYOUT\n10,10,200,22,0.10|faint one\n10,40,200,52,0.20|faint two"
    if cls == "nfkc":
        return rng.choice(_NFKC_SAMPLES)
    if cls == "poison":
        return "%LAYOUT\nTHIS LINE HAS NO COORDINATES"
    raise ValueError(cls)


def generate_transcripts(
    n_convs: int,
    seed: int = 42,
    mega_every: int = 50,
    mega_factor: int = 40,
    dup_every: int = 37,
    conv_offset: int = 0,
) -> pa.Table:
    """Generate a transcripts table (TRANSCRIPT_SCHEMA) for conversations
    [conv_offset, conv_offset + n_convs).

    Every ``mega_every``-th conversation has ``mega_factor``× the median
    turn count (skew fixture, FIXTURES.md `mega_conv`); every
    ``dup_every``-th conversation duplicates one `(conv_id, turn_idx)`
    row (input dirt for exact dedup, FIXTURES.md `dup_turn`).

    Each conversation has its own RNG stream seeded by (seed, conv id),
    so any shard of the conversation range generates identically
    regardless of how generation is parallelized.
    """
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[datetime.datetime] = []

    for c in range(conv_offset, conv_offset + n_convs):
        # independent stream per conversation → subsets reproducible
        rng = random.Random(seed * 1_000_003 + c)
        base_turns = rng.randrange(4, 12)
        if mega_every and c % mega_every == mega_every - 1:
            base_turns *= mega_factor
        conv = f"conv{c:06d}"
        for t in range(base_turns):
            cls = rng.choices(PAYLOAD_CLASSES, weights=_WEIGHTS, k=1)[0]
            text = _payload(rng, cls)
            role = _ROLES[t % len(_ROLES)]
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append("search" if role == "tool" else "")
            tss.append(_EPOCH + datetime.timedelta(seconds=c * 10_000 + t))
        if dup_every and c % dup_every == dup_every - 1 and base_turns > 0:
            # duplicate the first turn verbatim
            conv_ids.append(conv)
            turn_idxs.append(0)
            roles.append(roles[-base_turns])
            texts.append(texts[-base_turns])
            tools.append(tools[-base_turns])
            tss.append(tss[-base_turns])

    from ..schema import TRANSCRIPT_SCHEMA

    return pa.Table.from_arrays(
        [
            pa.array(conv_ids, pa.string()),
            pa.array(turn_idxs, pa.int32()),
            pa.array(roles, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(tools, pa.string()),
            pa.array(tss, pa.timestamp("us")),
        ],
        schema=TRANSCRIPT_SCHEMA,
    )


def _write_shard(args) -> str:
    out_dir, shard, conv_offset, n_convs, seed, kwargs = args
    table = generate_transcripts(n_convs, seed=seed, conv_offset=conv_offset, **kwargs)
    path = f"{out_dir}/part-{shard:05d}.parquet"
    pq.write_table(table, path)
    return path


def write_transcripts(
    out_dir: str,
    n_convs: int,
    seed: int = 42,
    rows_per_file: int = 50_000,
    convs_per_shard: int = 4_000,
    **kwargs,
) -> str:
    """Write the generated table as one-or-more parquet files (multiple
    files → multiple read tasks → real parallelism at bench time).
    Large corpora are generated in parallel, one shard of the
    conversation range per worker — per-conversation RNG streams make
    the result independent of sharding."""
    os.makedirs(out_dir, exist_ok=True)
    del rows_per_file  # superseded by convs_per_shard sharding
    shards = [
        (out_dir, i, lo, min(convs_per_shard, n_convs - lo), seed, kwargs)
        for i, lo in enumerate(range(0, n_convs, convs_per_shard))
    ]
    if len(shards) <= 1 or n_convs < 8_000:
        for s in shards:
            _write_shard(s)
    else:
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(min(16, len(shards))) as pool:
            pool.map(_write_shard, shards)
    return out_dir


def cached_transcripts_dir(
    n_convs: int, seed: int = 42, root: str = "/tmp/ior_transcripts", **kwargs
) -> str:
    """Generate-once cache keyed by the generator parameters."""
    key = f"n{n_convs}_s{seed}" + "".join(f"_{k}{v}" for k, v in sorted(kwargs.items()))
    out = os.path.join(root, key)
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        write_transcripts(out, n_convs, seed=seed, **kwargs)
        with open(done, "w") as f:
            f.write("ok\n")
    return out


# --- documents → transcripts (SQL-expressible derivation) -----------------

N_CONV_BUCKETS = 100

# The same derivation in DuckDB SQL, for oracle parity. Keep in lockstep
# with `transcripts_from_documents`.
SQL_DERIVATION = f"""
SELECT
  'c' || lpad(CAST(doc_id % {N_CONV_BUCKETS} AS VARCHAR), 5, '0') AS conv_id,
  CAST(doc_id // {N_CONV_BUCKETS} AS INTEGER) AS turn_idx,
  CASE doc_id % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
  text,
  '' AS tool,
  TIMESTAMP '2025-01-01 00:00:00' + to_microseconds(doc_id * 1000000) AS ts
FROM documents
"""


def transcripts_from_documents(sf_dir: str):
    """Ray Dataset of transcripts derived from ``documents.parquet``.

    conv_id = doc_id % 100 (zero-padded), turn_idx = doc_id // 100 —
    exactly mirrors ``SQL_DERIVATION`` so DuckDB oracles can reproduce
    the input. Column-pruned read (only doc_id + text leave storage).
    """
    import numpy as np
    import ray.data as rd

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    # tiny lookup tables beat per-row string formatting
    conv_names = np.array([f"c{i:05d}" for i in range(N_CONV_BUCKETS)])
    roles = np.array(["user", "assistant", "tool"])
    epoch_us = (_EPOCH - datetime.datetime(1970, 1, 1)) // datetime.timedelta(microseconds=1)

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        from ..schema import TRANSCRIPT_SCHEMA

        return pa.Table.from_arrays(
            [
                pa.array(conv_names[ids % N_CONV_BUCKETS], pa.string()),
                pa.array((ids // N_CONV_BUCKETS).astype(np.int32), pa.int32()),
                pa.array(roles[ids % 3], pa.string()),
                batch.column("text"),
                pa.array(np.full(n, "", dtype=object), pa.string()),
                pa.array(epoch_us + ids * 1_000_000, pa.timestamp("us")),
            ],
            schema=TRANSCRIPT_SCHEMA,
        )

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
