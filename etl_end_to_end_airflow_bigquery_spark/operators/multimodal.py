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
