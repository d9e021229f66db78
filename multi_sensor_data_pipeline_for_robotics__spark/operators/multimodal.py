"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the actual decode is
STUBBED: ``decoder="fake"`` is a deterministic byte-level feature
extractor (real Spark plumbing — schema, batching, partitioning — with
fake pixels), and ``decoder="pil"``/``"ffmpeg"`` raise
``NotImplementedError`` at the point the real library would be called.
Everything around the decode — the batch iterator, the output schema,
the partition-parallel execution — is production-shaped.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow record batches per partition, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` x mean payload size.
Repartition upstream by a size-balanced key when payloads are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_kind string, media_meta string"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum long, head_bytes array<int>"
)


def attach_fake_media(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media table from a text table: the UTF-8 payload stands
    in for an encoded image. Schema matches what a real ingest (e.g.
    ``spark.read.format('binaryFile')``) would produce."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("image/fake").alias("media_kind"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias(
            "media_meta"
        ),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic byte-level 'decode': length, additive checksum,
    first-4-byte head. Stands in for decode→resize→feature-extract."""
    out = pd.DataFrame()
    out["doc_id"] = pdf["doc_id"]
    payloads = pdf["media"].apply(bytes)
    out["n_bytes"] = payloads.apply(len).astype("int64")
    out["checksum"] = payloads.apply(lambda b: sum(b) % 2_147_483_647).astype("int64")
    out["head_bytes"] = payloads.apply(lambda b: [int(x) for x in b[:4]])
    return out


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_checksum long"


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 32,
    stride: int = 2,
    decoder: str = "fake",
) -> DataFrame:
    """Frame sampling over a binary "video" column: the payload is cut
    into ``frame_bytes`` chunks and every ``stride``-th chunk is kept,
    emitting one row per sampled frame (long format — frames explode
    across partitions, no driver involvement).

    ``decoder='fake'`` computes a deterministic per-frame byte checksum
    (additive mod 2^31) in place of real pixel decoding; ``'ffmpeg'``
    raises until the codec exists. The Arrow batching, long-format
    output shape and partition parallelism are exactly what the real
    decoder would use.
    """
    if decoder == "ffmpeg":
        def decode(pdf: pd.DataFrame) -> pd.DataFrame:
            raise NotImplementedError("decoder='ffmpeg': codec not present")
    elif decoder == "fake":
        def decode(pdf: pd.DataFrame) -> pd.DataFrame:
            out = {"doc_id": [], "frame_idx": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, stride):
                    chunk = b[fi * frame_bytes : (fi + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(fi)
                    out["frame_checksum"].append(sum(chunk) % 2_147_483_647)
            return pd.DataFrame(out)
    else:
        raise ValueError(f"unknown decoder: {decoder}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield decode(pdf)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id long, media binary, n_bytes_out long"


def resize_media(
    media: DataFrame, target_bytes: int = 64, decoder: str = "fake"
) -> DataFrame:
    """Resize stub: deterministic nearest-neighbor downsample of the
    payload to ``target_bytes`` (byte k of the output is byte
    ``k*n // target`` of the input) — the byte-level stand-in for image
    resampling. Real decoders raise until codecs exist; the
    ``mapInPandas`` batching and binary-out schema are the production
    shape.
    """
    if decoder != "fake":
        def decode(pdf: pd.DataFrame) -> pd.DataFrame:
            raise NotImplementedError(f"decoder={decoder!r}: codec not present")
    else:
        def decode(pdf: pd.DataFrame) -> pd.DataFrame:
            out = {"doc_id": [], "media": [], "n_bytes_out": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(payload)
                n = len(b)
                resized = (
                    bytes(b[(k * n) // target_bytes] for k in range(target_bytes))
                    if n
                    else b""
                )
                out["doc_id"].append(doc_id)
                out["media"].append(resized)
                out["n_bytes_out"].append(len(resized))
            return pd.DataFrame(out)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield decode(pdf)

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_size_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over a binary media column.

    ``decoder='fake'`` → deterministic byte features (testable without
    codecs). ``'pil'``/``'ffmpeg'`` → the real implementations would
    decode pixels / sample frames here; they raise until the codec libs
    are available.
    """
    if decoder == "fake":
        decode = _fake_decode_batch
    elif decoder in ("pil", "ffmpeg"):
        def decode(pdf: pd.DataFrame) -> pd.DataFrame:
            raise NotImplementedError(
                f"decoder={decoder!r}: real codec not present in this "
                "environment; plumbing is identical to decoder='fake'"
            )
    else:
        raise ValueError(f"unknown decoder: {decoder}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield decode(pdf)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
