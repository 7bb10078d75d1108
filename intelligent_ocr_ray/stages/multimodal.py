"""Multimodal columns: opaque `binary` payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as actor-pool
map_batches stages.

This is the engine analog of the reference's page-image path — render
(core/pdf_processor.py:878-907), colorspace convert (838-859), adaptive
size guard (796-836) — generalized to arbitrary media payloads riding
in Arrow binary columns.

The container has no image/audio libraries, so the *codec* layer is
stubbed (README terms: clearly-marked deterministic fake behind an
import-try), while everything Ray-side is real and tested: schema
(binary + struct metadata), small-batch sizing for large payloads,
actor signature (decoder state built once per actor in __init__),
zero-copy Arrow in/out, and the fallback-not-drop error contract
(status column, mirroring the extractor's R2 semantics).

Fake formats (deterministic, self-describing):
  FIMG: b"FIMG" | u16 width | u16 height | u8 channels | zlib(pixels)
  FAUD: b"FAUD" | u32 sample_rate | u32 n_samples | zlib(i16 samples)
  FVID: b"FVID" | u16 n_frames | u16 width | u16 height | zlib(frames)
Real formats (PNG/JPEG/WAV/...) raise NotImplementedError unless the
optional libs exist — the documented integration point.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

try:  # pragma: no cover - not present in this container
    from PIL import Image as _PIL_Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_BATCH_SIZE = 256  # payloads are KB-MB: batch × concurrency must fit heap


# --- deterministic synthetic payloads (fixture generator) -----------------


def _rng_for(key: int) -> np.random.RandomState:
    return np.random.RandomState((key * 2_654_435_761) % (2**32))


def fake_image_bytes(key: int) -> bytes:
    """Deterministic FIMG payload with SQL-replayable arithmetic (keep
    in lockstep with ``MULTIMODAL_SQL``): w = 8 + 5k % 56,
    h = 8 + 3k % 56, c = 3, pixel[i] = (k + i) % 256. Integer pixels
    make every downstream float metric a single exact IEEE division
    (integer sum / count), so the decode pipeline is hash-checkable
    against a DuckDB oracle — the encode→resize→re-encode→decode
    round-trip through the real codec layer is what the Ray side adds."""
    w, h, c = 8 + (5 * key) % 56, 8 + (3 * key) % 56, 3
    pixels = ((key + np.arange(w * h * c, dtype=np.int64)) % 256).astype(np.uint8)
    return b"FIMG" + struct.pack("<HHB", w, h, c) + zlib.compress(pixels.tobytes())


def fake_audio_bytes(key: int) -> bytes:
    rng = _rng_for(key ^ 0xA5A5)
    sr = 16_000
    n = int(rng.randint(100, 2000))
    samples = (rng.randn(n) * 3000).astype(np.int16)
    return b"FAUD" + struct.pack("<II", sr, n) + zlib.compress(samples.tobytes())


def fake_video_bytes(key: int) -> bytes:
    rng = _rng_for(key ^ 0x5A5A)
    f, w, h = int(rng.randint(4, 32)), 16, 16
    frames = rng.randint(0, 256, size=f * w * h, dtype=np.int64).astype(np.uint8)
    return b"FVID" + struct.pack("<HHH", f, w, h) + zlib.compress(frames.tobytes())


def synthesize_media_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Attach deterministic binary media columns keyed by the id column
    (the corpus-side fixture: every doc gets an image, every 3rd an
    audio clip, every 7th a video)."""
    ids = batch.column(id_col).to_pylist()
    img = [fake_image_bytes(i) for i in ids]
    aud = [fake_audio_bytes(i) if i % 3 == 0 else None for i in ids]
    vid = [fake_video_bytes(i) if i % 7 == 0 else None for i in ids]
    return (
        batch.append_column("image", pa.array(img, pa.binary()))
        .append_column("audio", pa.array(aud, pa.binary()))
        .append_column("video", pa.array(vid, pa.binary()))
    )


# --- decoders -------------------------------------------------------------


def _decode_pil(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Real-codec integration point (VERDICT r3 #8): decode any
    PIL-supported format (PNG/JPEG/...) to the SAME (w, h, channels,
    flat uint8 pixels) contract as the deterministic FIMG fake, so the
    whole downstream Ray plumbing (batch sizing, feature reduction,
    status column) is codec-agnostic. Only reachable when PIL imports;
    this container ships without it, so CI exercises the fallback
    branch — tests/test_multimodal.py runs either way."""
    import io

    img = _PIL_Image.open(io.BytesIO(data))
    if img.mode not in ("L", "RGB", "RGBA"):
        img = img.convert("RGB")
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        c = 1
    else:
        h, w, c = arr.shape
    return w, h, c, arr.reshape(-1)


def _decode_fimg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    w, h, c = struct.unpack("<HHB", data[4:9])
    px = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    return w, h, c, px


class DecodeImage:
    """Actor-pool stage: binary image column → width/height/channels +
    mean-pixel feature. Decoder state (codec registry) is built once per
    actor (__init__), per-batch work is decode + numpy reduction.

    Output columns: {col}_width/height/channels int32, {col}_mean
    float64, {col}_status string ('ok' | 'null' | 'error: ...') —
    errors are emitted, never dropped (extractor R2 contract)."""

    MAGIC = b"FIMG"

    def __init__(self, col: str = "image"):
        self.col = col
        # registry: magic → decoder; real codecs plug in here
        self.codecs = {self.MAGIC: _decode_fimg}

    def decode(self, data: bytes) -> tuple[int, int, int, np.ndarray]:
        magic = data[:4]
        fn = self.codecs.get(magic)
        if fn is None:
            if HAVE_PIL:  # pragma: no cover — PIL absent in this container
                try:
                    return _decode_pil(data)
                except Exception as e:  # noqa: BLE001 — undecodable payload
                    raise NotImplementedError(
                        f"PIL could not decode payload (magic {magic!r}): {e}"
                    ) from e
            raise NotImplementedError(
                f"no codec for magic {magic!r} (image libs not installed)"
            )
        return fn(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        n = len(payloads)
        width = np.zeros(n, np.int32)
        height = np.zeros(n, np.int32)
        channels = np.zeros(n, np.int32)
        mean = np.full(n, np.nan, np.float64)
        status: list[str] = []
        for i, data in enumerate(payloads):
            if data is None:
                status.append("null")
                continue
            try:
                w, h, c, px = self.decode(data)
                width[i], height[i], channels[i] = w, h, c
                mean[i] = float(px.mean()) if len(px) else 0.0
                status.append("ok")
            except (NotImplementedError, zlib.error, struct.error) as e:
                status.append(f"error: {type(e).__name__}: {e}")
        p = self.col
        return (
            batch.drop_columns([self.col])
            .append_column(f"{p}_width", pa.array(width, pa.int32()))
            .append_column(f"{p}_height", pa.array(height, pa.int32()))
            .append_column(f"{p}_channels", pa.array(channels, pa.int32()))
            .append_column(f"{p}_mean", pa.array(mean, pa.float64()))
            .append_column(f"{p}_status", pa.array(status, pa.string()))
        )


class DecodeAudio:
    """Actor-pool stage: FAUD payloads → sample_rate / duration /
    RMS-energy feature. Same contract as DecodeImage (errors emitted,
    never dropped; real codecs plug into the registry)."""

    def __init__(self, col: str = "audio"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        n = len(payloads)
        rate = np.zeros(n, np.int32)
        dur = np.full(n, np.nan, np.float64)
        rms = np.full(n, np.nan, np.float64)
        status: list[str] = []
        for i, data in enumerate(payloads):
            if data is None:
                status.append("null")
                continue
            if data[:4] != b"FAUD":
                status.append("error: NotImplementedError: no codec for real audio")
                continue
            try:
                sr, ns = struct.unpack("<II", data[4:12])
                samples = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16)
                rate[i] = sr
                dur[i] = ns / sr
                rms[i] = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                status.append("ok")
            except (zlib.error, struct.error) as e:
                status.append(f"error: {type(e).__name__}: {e}")
        p = self.col
        return (
            batch.drop_columns([self.col])
            .append_column(f"{p}_sample_rate", pa.array(rate, pa.int32()))
            .append_column(f"{p}_duration_s", pa.array(dur, pa.float64()))
            .append_column(f"{p}_rms", pa.array(rms, pa.float64()))
            .append_column(f"{p}_status", pa.array(status, pa.string()))
        )


class ResizeImage:
    """Actor-pool stage: nearest-neighbor resize of FIMG payloads to a
    fixed target (the adaptive-zoom/size-guard analog,
    core/pdf_processor.py:796-836: payloads above the cap are scaled
    down before the model stage). Emits a new binary column plus the
    actual scale applied (callers must use it, as the reference's
    actual_zoom contract demands, pdf_processor.py:893-898)."""

    def __init__(self, col: str = "image", max_side: int = 32):
        self.col = col
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        out: list[bytes | None] = []
        scales: list[float] = []
        for data in payloads:
            if data is None or data[:4] != b"FIMG":
                out.append(data)
                scales.append(1.0)
                continue
            w, h, c, px = _decode_fimg(data)
            side = max(w, h)
            if side <= self.max_side:
                out.append(data)
                scales.append(1.0)
                continue
            scale = self.max_side / side
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            img = px.reshape(h, w, c)
            yi = (np.arange(nh) / scale).astype(np.int64).clip(0, h - 1)
            xi = (np.arange(nw) / scale).astype(np.int64).clip(0, w - 1)
            small = img[yi][:, xi].astype(np.uint8)
            out.append(
                b"FIMG" + struct.pack("<HHB", nw, nh, c) + zlib.compress(small.tobytes())
            )
            scales.append(scale)
        idx = batch.schema.get_field_index(self.col)
        return batch.set_column(
            idx, self.col, pa.array(out, pa.binary())
        ).append_column("resize_scale", pa.array(scales, pa.float64()))


class SampleFrames:
    """Actor-pool stage: frame-sample FVID payloads every `stride`
    frames → per-frame mean features as list<float64> (the video analog
    of per-page rendering: one doc fans out to several frames)."""

    def __init__(self, col: str = "video", stride: int = 4):
        self.col = col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.col).to_pylist()
        feats: list[list[float] | None] = []
        counts: list[int] = []
        for data in payloads:
            if data is None:
                feats.append(None)
                counts.append(0)
                continue
            if data[:4] != b"FVID":
                raise NotImplementedError("no codec for real video formats")
            f, w, h = struct.unpack("<HHH", data[4:10])
            frames = np.frombuffer(zlib.decompress(data[10:]), dtype=np.uint8).reshape(
                f, h * w
            )
            sampled = frames[:: self.stride]
            feats.append([float(x) for x in sampled.mean(axis=1)])
            counts.append(len(sampled))
        return batch.drop_columns([self.col]).append_column(
            "frame_means", pa.array(feats, pa.list_(pa.float64()))
        ).append_column("n_frames_sampled", pa.array(counts, pa.int32()))


# --- pipeline -------------------------------------------------------------


def multimodal_pipeline(sf_dir: str, *, concurrency=2):
    """documents → synthesize media → resize guard → decode features.
    Small batch_size: binary payloads make row-bytes large, so blocks
    must stay small for batch × concurrency to fit worker heaps."""
    import os

    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    ds = ds.map_batches(
        synthesize_media_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=MEDIA_BATCH_SIZE,
    )
    # num_cpus=0.5: two light actor pools must leave cores free for the
    # read/synthesize tasks even on a small (4-CPU test) cluster —
    # stacked pools at num_cpus=1 can starve upstream tasks and stall
    # the stream.
    ds = ds.map_batches(
        ResizeImage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    ds = ds.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=0.5,
    )
    return ds.select_columns(
        ["doc_id", "image_width", "image_height", "image_channels",
         "image_mean", "image_status", "resize_scale"]
    )


# The expected decode output, derived in SQL from the fixture
# arithmetic (fake_image_bytes + ResizeImage's nearest-neighbor gather
# + DecodeImage's integer-sum mean) — never by parsing the payload
# bytes: the encode → resize-guard → re-encode → decode round-trip
# through the real codec registry is exactly what the Ray side adds.
# Resize contract replayed here (max_side=32, core/pdf_processor.py:
# 796-836 analog): scale = 32/max(w,h) when max(w,h) > 32 else 1;
# nw = max(1, trunc(w*scale)); source row/col = clip(trunc(i/scale));
# every float is a single exact IEEE division of integers.
MULTIMODAL_SQL = """
WITH m AS (
  SELECT doc_id AS d,
         8 + (5 * doc_id) % 56 AS w,
         8 + (3 * doc_id) % 56 AS h,
         3 AS c
  FROM documents
),
geo AS (
  SELECT d, w, h, c,
         CASE WHEN greatest(w, h) <= 32 THEN 1.0
              ELSE 32.0 / greatest(w, h) END AS scale
  FROM m
),
geo2 AS (
  SELECT d, w, h, c, scale,
         CASE WHEN scale = 1.0 THEN w
              ELSE greatest(1, CAST(trunc(w * scale) AS BIGINT)) END AS nw,
         CASE WHEN scale = 1.0 THEN h
              ELSE greatest(1, CAST(trunc(h * scale) AS BIGINT)) END AS nh
  FROM geo
),
ys AS (
  SELECT d, w, h, c, scale, nw, nh, unnest(range(nh)) AS y FROM geo2
),
yx AS (
  SELECT d, w, c, scale, nw, nh,
         least(h - 1, CAST(trunc(y / scale) AS BIGINT)) AS yi,
         unnest(range(nw)) AS x
  FROM ys
),
px AS (
  SELECT d, nw, nh,
         sum((d + ((yi * w + least(w - 1, CAST(trunc(x / scale) AS BIGINT))) * c
                   + ch)) % 256) AS s,
         count(*) AS n
  FROM (SELECT *, unnest(range(c)) AS ch FROM yx)
  GROUP BY d, nw, nh
)
SELECT g.d AS doc_id,
       CAST(p.nw AS INTEGER) AS image_width,
       CAST(p.nh AS INTEGER) AS image_height,
       3 AS image_channels,
       CAST(p.s AS DOUBLE) / p.n AS image_mean,
       'ok' AS image_status,
       g.scale AS resize_scale
FROM geo2 g JOIN px p ON p.d = g.d
"""
