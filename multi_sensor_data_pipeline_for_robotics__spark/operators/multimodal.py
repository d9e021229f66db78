"""Multimodal column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codec LIBRARIES, so the ffmpeg/PIL
class of decodes is stubbed: ``decoder="fake"`` is a deterministic
byte-level feature extractor (real Spark plumbing — schema, batching,
partitioning — with fake pixels), and ``decoder="pil"``/``"ffmpeg"``
raise ``NotImplementedError`` at the point the real library would be
called. One REAL codec needs no library and is fully implemented:
binary PPM (P6) — ``attach_ppm_media`` encodes genuine images,
``extract_image_features`` decodes pixels (pure-numpy spec-complete
parser: comments, whitespace, truncation errors), and
``resize_image_ppm`` is a real nearest-neighbor resample re-encoded as
P6. Everything around every decode — the batch iterator, the output
schema, the partition-parallel execution — is production-shaped.

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


# ---------------------------------------------------------------------------
# REAL codec: binary PPM (P6) — pure numpy, no external library, so
# decoder='fake' is no longer the only working path. The ffmpeg/PIL
# class of codecs stays honestly stubbed; PPM needs none of them.
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, mean_r double, mean_g double,"
    " mean_b double, pixel_checksum long"
)

PPM_MOD = 2_147_483_647


def _encode_p6(w: int, h: int, raster: "bytes", maxval: int = 255) -> bytes:
    return b"P6\n%d %d\n%d\n" % (w, h, maxval) + raster


def _parse_p6(b: bytes):
    """Parse a binary PPM (P6): returns ``(width, height, ndarray of
    shape (h, w, 3), maxval)`` — ``uint8`` samples for maxval <= 255,
    ``uint16`` (big-endian 2-byte samples per the spec) for
    256 <= maxval <= 65535. Full spec header handling — arbitrary
    whitespace between tokens and ``#`` comments through end-of-line —
    then exactly one whitespace byte before the raster. Raises
    ValueError on malformed or truncated payloads (the per-row contract
    callers turn into a decode_error)."""
    import numpy as np

    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        toks.append(b[start:pos])
    w, h, maxval = (int(t) for t in toks)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError(f"bad PPM dimensions/maxval: {w}x{h}/{maxval}")
    pos += 1  # exactly one whitespace byte separates header and raster
    dt = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
    n = w * h * 3 * dt.itemsize
    raster = b[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"truncated PPM raster: {len(raster)} of {n} bytes")
    return w, h, np.frombuffer(raster, dtype=dt).reshape(h, w, 3), maxval


def attach_ppm_media(
    df: DataFrame, id_col: str = "doc_id", width: int = 8, height: int = 8
) -> DataFrame:
    """Build a media table of REAL P6 PPM images whose pixels are a
    deterministic function of the doc id — byte i of the raster is
    ``(doc_id * 31 + i) % 256`` — so every downstream decode result is
    replayable from pure arithmetic in any engine (the oracle never
    parses bytes; it recomputes what the encoder wrote). Encoding is
    one vectorized numpy matrix per Arrow batch; payloads never touch
    the driver."""
    import json

    n = width * height * 3
    meta = json.dumps({"w": width, "h": height})

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        idx = np.arange(n, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy(dtype="int64")
            px = ((ids[:, None] * 31 + idx[None, :]) % 256).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media": [
                        _encode_p6(width, height, row.tobytes()) for row in px
                    ],
                    "media_kind": "image/x-portable-pixmap",
                    "media_meta": meta,
                }
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def attach_ppm_classes(
    df: DataFrame,
    id_col: str = "doc_id",
    n_classes: int = 16,
    width: int = 8,
    height: int = 8,
    jitter_levels: int = 7,
) -> DataFrame:
    """Build a media table of REAL P6 images with a NEAR-DUPLICATE
    structure: raster byte i of doc d is the CLASS pattern
    ``(i * (2*(d % n_classes) + 3)) % 256`` — a per-class sawtooth whose
    period differs by class, so class aHashes sit >= 21 bits apart —
    except at one per-doc jitter position ``i = d % (w*h*3)``, where
    ``(pattern + 1 + (d // n_classes) % jitter_levels) % 256`` replaces
    it: every doc is a one-byte perturbation of its class image
    (aHash moves <= 1 bit), the "jittered copies" fixture for
    :func:`phash_neardup`. All pixels are pure arithmetic in (d, i),
    so downstream hashes replay exactly in any engine (the
    :func:`attach_ppm_media` oracle discipline). (A smooth ramp like
    attach_ppm_media's ``(d*31+i) % 256`` is useless here: average-hash
    of a near-linear gradient is shift-invariant enough that every
    class hashes IDENTICALLY.)"""
    import json

    n = width * height * 3
    meta = json.dumps({"w": width, "h": height})

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        idx = np.arange(n, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].to_numpy(dtype="int64")
            px = (idx[None, :] * (2 * (ids[:, None] % n_classes) + 3)) % 256
            jpos = ids % n
            jval = (
                px[np.arange(len(ids)), jpos]
                + 1
                + (ids // n_classes) % jitter_levels
            ) % 256
            px[np.arange(len(ids)), jpos] = jval
            px = px.astype(np.uint8)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media": [
                        _encode_p6(width, height, row.tobytes()) for row in px
                    ],
                    "media_kind": "image/x-portable-pixmap",
                    "media_meta": meta,
                }
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


PHASH_SCHEMA = "doc_id long, phash long"


def image_phash(
    media: DataFrame, decoder: str = "ppm", grid: int = 8
) -> DataFrame:
    """64-bit average-hash (aHash) per image over the REAL decode path:
    decode → nearest-neighbor resample to ``grid``x``grid`` (the
    :func:`resize_image_ppm` index rule) → integer grayscale
    ``(r+g+b)//3`` → bit p set iff ``gray_p * grid² > sum(gray)``
    (the all-integer form of "above the mean", exact in any engine) →
    bits packed LSB-first by pixel index ``p = y*grid + x`` into one
    signed long (bit 63 lands in the sign bit, the
    ``dedup.simhash64`` packing rule). Output: ``(doc_id, phash)``.

    This is the image face of the dedup family: feed the table to
    ``operators.dedup.hamming_pairs`` (or use :func:`phash_neardup`)
    for near-duplicate image pairs. ``decoder='pil'``/``'ffmpeg'``
    raise until those codecs exist; the aHash arithmetic itself is
    codec-independent."""
    if grid * grid != 64:
        raise ValueError("grid must be 8 (64-bit aHash)")
    if decoder in ("pil", "ffmpeg"):
        def hash_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            raise NotImplementedError(
                f"decoder={decoder!r}: real codec not present; 'ppm' is"
                " the working no-dependency path"
            )
    elif decoder == "ppm":
        def hash_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            shifts = np.arange(64, dtype=np.uint64)
            out = {"doc_id": [], "phash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                w, h, img, _maxval = _parse_p6(bytes(payload))
                yi = (np.arange(grid, dtype=np.int64) * h) // grid
                xi = (np.arange(grid, dtype=np.int64) * w) // grid
                small = img[yi][:, xi].astype(np.int64)
                gray = small.sum(axis=2) // 3
                bits = (gray.ravel() * 64 > gray.sum()).astype(np.uint64)
                acc = int(np.bitwise_or.reduce(bits << shifts))
                if acc >= 1 << 63:  # wrap to the signed-long lattice
                    acc -= 1 << 64
                out["doc_id"].append(doc_id)
                out["phash"].append(acc)
            return pd.DataFrame(out)
    else:
        raise ValueError(f"unknown decoder: {decoder}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield hash_batch(pdf)

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_neardup(
    media: DataFrame,
    max_hamming: int = 3,
    decoder: str = "ppm",
    grid: int = 8,
) -> DataFrame:
    """Near-duplicate IMAGE pairs: :func:`image_phash` signatures fed
    through the SimHash block-banding machinery
    (``operators.dedup.hamming_pairs`` — k+1 blocks, equi-join per
    block, exact ``bit_count(xor)`` filter, identical-signature
    collapse) — zero new join machinery, the multimodal column joined
    into the dedup family. Output: ``(doc_a, doc_b, hamming)``."""
    from multi_sensor_data_pipeline_for_robotics__spark.cache import maybe_persist
    from multi_sensor_data_pipeline_for_robotics__spark.operators.dedup import (
        hamming_pairs,
    )

    sig = maybe_persist(image_phash(media, decoder=decoder, grid=grid))
    return hamming_pairs(
        sig, max_hamming=max_hamming, id_col="doc_id", sig_col="phash", width=64
    )


def extract_image_features(media: DataFrame, decoder: str = "ppm") -> DataFrame:
    """REAL pixel-level feature extraction: decode each payload and
    emit per-channel means (rounded to 6, the cross-engine float rule),
    dimensions, and an exact integer pixel checksum
    (``sum(raster) mod 2^31-1``). ``decoder='ppm'`` is a working
    pure-numpy P6 parser; ``'pil'``/``'ffmpeg'`` raise until those
    codecs exist (same plumbing)."""
    if decoder == "ppm":
        def decode(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            out = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
                "pixel_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                w, h, img, _maxval = _parse_p6(bytes(payload))
                means = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(round(float(means[0]), 6))
                out["mean_g"].append(round(float(means[1]), 6))
                out["mean_b"].append(round(float(means[2]), 6))
                out["pixel_checksum"].append(
                    int(img.sum(dtype=np.int64)) % PPM_MOD
                )
            return pd.DataFrame(out)
    elif decoder in ("pil", "ffmpeg"):
        def decode(pdf: pd.DataFrame) -> pd.DataFrame:
            raise NotImplementedError(
                f"decoder={decoder!r}: real codec not present; the 'ppm'"
                " decoder is the working no-dependency path"
            )
    else:
        raise ValueError(f"unknown decoder: {decoder}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield decode(pdf)

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


def resize_image_ppm(
    media: DataFrame, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """REAL nearest-neighbor image resize on decoded P6 pixels —
    output pixel (y, x) samples source pixel
    ``(y*src_h // out_h, x*src_w // out_w)`` — re-encoded as P6, so the
    result chains back into any consumer of PPM media.
    (``resize_media`` remains the byte-level stub for non-decodable
    payloads.) One numpy fancy-index per image, Arrow-batched,
    driver-free."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("out_w and out_h must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            out = {"doc_id": [], "media": [], "media_kind": [], "media_meta": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                w, h, img, maxval = _parse_p6(bytes(payload))
                yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
                xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
                small = img[yi][:, xi]
                out["doc_id"].append(doc_id)
                out["media"].append(
                    _encode_p6(out_w, out_h, small.tobytes(), maxval)
                )
                out["media_kind"].append("image/x-portable-pixmap")
                out["media_meta"].append('{"w": %d, "h": %d}' % (out_w, out_h))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
