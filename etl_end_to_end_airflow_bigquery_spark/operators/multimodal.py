"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the asset is an opaque
``binary`` column (or a pointer into object storage for >row-group-size
blobs), metadata is a typed struct, and all content-touching work runs
as Arrow-batched ``mapInPandas`` so the decode library executes once per
batch, not per row. The schema contract is ``schemas.MULTIMODAL_SCHEMA``.

The decode step itself is STUBBED — the container ships no image/audio
codecs — behind ``decode_stub``: a deterministic fake that yields the
right shapes so the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested. Swap ``decode_stub`` for a
PIL/ffmpeg call in production; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "asset_id long, modality string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int"
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder.

    Real decoders (PIL.Image.open, soundfile, pyav) are not installed in
    this environment; this stands in with content-derived fake dimensions
    so tests exercise real data flow. Raise instead if strictness is
    wanted: ``raise NotImplementedError("image codec not available")``.
    """
    digest = hashlib.sha256(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "sha256": digest,
        "width": int(digest[:4], 16) % 1920,
        "height": int(digest[4:8], 16) % 1080,
        # content-derived fake frame count (1..240) so frame sampling has
        # real variety to explode over; a video decoder reports the truth
        "n_frames": int(digest[8:12], 16) % 240 + 1,
    }


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode/feature-extract binary assets via Arrow-batched mapInPandas.

    Input: MULTIMODAL_SCHEMA-shaped frame. The iterator-of-batches form
    keeps peak memory at one Arrow batch per task regardless of asset
    count; repartition upstream to bound batch byte size when payloads
    are large (e.g. ``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode_stub(p if p is not None else b"") for p in pdf["payload"]]
            out = pd.DataFrame(meta)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            out.insert(1, "modality", pdf["modality"].values)
            yield out

    return assets.mapInPandas(_decode, schema=DECODED_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video assets: explode into per-frame
    rows (frame index + stub payload slice). The slice is fake (codec
    stub); the explode/partition shape is the real contract."""
    decoded = decode_assets(assets)
    return decoded.select(
        "asset_id",
        "modality",
        F.explode(
            F.expr(f"sequence(0, greatest(n_frames - 1, 0), {every_n})")
        ).alias("frame_idx"),
        "sha256",
    )


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resampler: truncate/keep the payload to the
    target byte budget (``width*height``). A real implementation is
    PIL ``Image.resize`` / ffmpeg scale; the binary-in→binary-out
    contract is what the pipeline depends on."""
    return payload[: width * height]


def resize_assets(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: binary→binary transform over Arrow batches.

    Keeps the MULTIMODAL shape (asset_id, modality, payload, meta) with
    the meta width/height rewritten to the target, so resize composes
    with ``decode_assets``/``extract_features`` downstream. Pure map
    stage — no shuffle; batch-at-a-time memory. Output schema matches
    the input contract so resized corpora round-trip through the same
    writers.
    """
    out_schema = (
        "asset_id long, modality string, payload binary, "
        "meta struct<mime: string, width: int, height: int, "
        "duration_ms: bigint, sha256: string>"
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                resize_stub(p if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "payload": payloads,
                    "meta": [
                        {
                            "mime": m["mime"] if m is not None else None,
                            "width": width,
                            "height": height,
                            "duration_ms": m["duration_ms"] if m is not None else None,
                            "sha256": hashlib.sha256(p).hexdigest(),
                        }
                        for m, p in zip(pdf["meta"], payloads)
                    ],
                }
            )

    return assets.mapInPandas(_resize, schema=out_schema)


FEATURE_DIM = 16


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction plumbing: payload → dense ``array<float>``.

    The stub embedding is content-derived (consecutive sha256 digest
    byte pairs scaled by /256 — exact in binary floating point, so the
    DuckDB oracle reproduces it bit-for-bit); a real extractor is a
    CLIP/wav2vec forward pass over the same Arrow batches. Output
    (asset_id, features) plugs straight into the similarity operators
    (cosine_topk / ivf_topk) — this is the multimodal→embedding bridge.
    ``dim`` ≤ 32 (sha256 yields 32 bytes).
    """
    if not 0 < dim <= 32:
        raise ValueError("dim must be in 1..32")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(p if p is not None else b"").digest()
                feats.append([digest[i] / 256.0 for i in range(dim)])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "features": feats,
                }
            )

    return assets.mapInPandas(
        _extract, schema="asset_id long, modality string, features array<float>"
    )


def text_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: documents → multimodal frame (text bytes as the payload).

    Lets the binary plumbing be exercised with the data on hand; real
    pipelines read image/audio bytes from parquet binary columns the
    same way.
    """
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.sha2(F.encode(F.col("text"), "UTF-8"), 256).alias("sha256"),
        ).alias("meta"),
    )


PHASH_BITS = 64
PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_MAX_HAMMING = 16


def phash_stub(payload: bytes) -> int:
    """Deterministic blockhash-style perceptual fingerprint over raw
    payload bytes — the pHash stand-in for this codec-less container.

    The real thing decodes pixels first (resize → grayscale → DCT or
    block means); this stub runs the SAME blockhash recipe over the
    byte stream: split the payload into 64 equal relative blocks and
    set bit i iff block i's mean byte exceeds the global mean
    (exact integer cross-multiplication ``s_i·n > total·c_i`` — no
    float ties). Scale-normalized like real blockhash (relative
    blocks), so truncation/padding-free payload variants land nearby;
    swap in a pixel decoder and nothing downstream changes. Returned
    as SIGNED int64 (two's complement) so the hash, its 16-bit bands
    and XOR/bit_count Hamming distances evaluate identically in
    Spark, DuckDB, and Python.
    """
    n = len(payload)
    if n == 0:
        return 0
    total = sum(payload)
    h = 0
    for i in range(PHASH_BITS):
        s, e = (i * n) // PHASH_BITS, ((i + 1) * n) // PHASH_BITS
        if sum(payload[s:e]) * n > total * (e - s):
            h |= 1 << i
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def perceptual_hash(assets: DataFrame) -> DataFrame:
    """payload → 64-bit perceptual hash via Arrow-batched mapInPandas
    (same decode-path shape as :func:`decode_assets`: the codec library
    runs once per batch, never per row; peak memory = one Arrow batch
    per task)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].values,
                    "modality": pdf["modality"].values,
                    "phash": [
                        phash_stub(p if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(
        _hash, schema="asset_id long, modality string, phash long"
    )


def phash_near_dup_pairs(
    hashes: DataFrame, max_hamming: int = PHASH_MAX_HAMMING
) -> DataFrame:
    """Hamming-banded LSH near-dup pairs over perceptual hashes —
    NEVER all-pairs: the 64-bit hash splits into 4 disjoint 16-bit
    bands; two assets become a candidate pair only if some band
    matches exactly (any pair within Hamming distance 3 is guaranteed
    caught — 4 bands, pigeonhole; farther pairs degrade gracefully),
    then the exact ``bit_count(xor)`` distance verifies candidates.
    The same banding scheme as ``dedup.minhash_candidate_pairs``, with
    bit-slices instead of minhash bands; the self-join shuffles on
    (band_idx, band_val), so cost tracks collision density, not n².
    The explicit repartition is the exchange barrier that lets both
    join sides reuse ONE hash computation (ReusedExchange)."""
    band_struct = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.expr(
                    f"cast(shiftright(phash, {b * PHASH_BAND_BITS})"
                    f" & {(1 << PHASH_BAND_BITS) - 1} as int)"
                ).alias("band_val"),
            )
            for b in range(PHASH_BANDS)
        ]
    )
    banded = (
        hashes.repartition("asset_id")
        .select("asset_id", "phash", F.explode(band_struct).alias("bs"))
        .select(
            "asset_id",
            "phash",
            F.col("bs.band_idx").alias("band_idx"),
            F.col("bs.band_val").alias("band_val"),
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.expr("cast(bit_count(a.phash ^ b.phash) as int)").alias(
                "hamming"
            ),
        )
        .dropDuplicates(["asset_a", "asset_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def byte_stats_arrow(assets: DataFrame) -> DataFrame:
    """Byte-class statistics over binary payloads via ``mapInArrow`` —
    the zero-copy sibling of :func:`decode_assets`'s mapInPandas path:
    batches arrive as Arrow RecordBatches (no pandas materialization,
    no object boxing for the binary column), counts are computed in
    numpy over each payload's byte buffer, and a new RecordBatch goes
    back. Completes the Python-surface matrix (pandas_udf /
    applyInPandas / cogrouped / UDTF / mapInPandas / mapInArrow).

    Pure map stage — no shuffle, batch-at-a-time memory. The per-row
    numpy views are cheap (buffer slices); a hotter path would run one
    ``np.add.reduceat`` over the batch's flat value buffer.
    """
    import pyarrow as pa

    def _stats(batches):
        import numpy as np

        for b in batches:
            ids = b.column("asset_id")
            n_bytes, n_lower, n_space, n_digit = [], [], [], []
            for v in b.column("payload"):
                a = np.frombuffer(v.as_py() or b"", dtype=np.uint8)
                n_bytes.append(int(a.size))
                n_lower.append(int(((a >= 97) & (a <= 122)).sum()))
                n_space.append(int((a == 32).sum()))
                n_digit.append(int(((a >= 48) & (a <= 57)).sum()))
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_bytes, pa.int64()),
                    pa.array(n_lower, pa.int64()),
                    pa.array(n_space, pa.int64()),
                    pa.array(n_digit, pa.int64()),
                ],
                names=["asset_id", "n_bytes", "n_lower", "n_space", "n_digit"],
            )

    return assets.select("asset_id", "payload").mapInArrow(
        _stats,
        "asset_id long, n_bytes long, n_lower long, n_space long, "
        "n_digit long",
    )
