"""Multimodal column plumbing (images/audio/video as opaque BINARY columns
with typed metadata). The decode step is STUBBED — no image/audio libs
exist in this environment — but the Spark-side plumbing (schema,
partitioning, Arrow batch shape, mapInPandas signature) is real and tested.

Pattern: media(doc_id BIGINT, media_type STRING, payload BINARY) →
mapInPandas feature extraction → (doc_id, n_bytes, sha256, feature ARRAY).
A real decoder (PIL/librosa/ffmpeg) is injected via
`media_features(media, decoder=...)` — closure-captured so it reaches
the Python workers (replacing the module-level `_decode_payload` by
monkeypatching would NOT: workers re-import the module). The swap seam
is test-gated end-to-end with a fake decoder.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 4

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def _decode_payload(payload: bytes, media_type: str) -> np.ndarray:
    """DEFAULT decode: deterministic fake 'pixels' derived from the payload
    bytes so the downstream feature math is exercised for real on opaque
    blobs (the driver testdata's documents-as-media adapter). Real decode
    for actual containers is numpy_decoder below (BMP/WAV, no external
    libs) — inject it via media_features(decoder=numpy_decoder); PIL/
    librosa/ffmpeg would slot into the same seam for compressed formats
    (absent in this environment). Raise NotImplementedError for media
    types neither path handles."""
    if media_type not in ("image", "audio", "blob"):
        raise NotImplementedError(f"decode for media_type={media_type!r}")
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    return arr.astype(np.float64)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL image decode, pure numpy: uncompressed 24-bit BI_RGB BMP
    (public format: BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4
    bytes, stored bottom-up, pixels BGR). Returns float64 samples in
    row-major TOP-DOWN order with channels reordered to RGB — the shape a
    feature extractor consumes. Loud ValueError on anything that is not
    this exact container class (a real fleet routes those to a library
    decoder through the same seam)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, "
                         f"compression={compression}); only uncompressed "
                         f"24-bit BI_RGB is decoded natively")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    need = off + stride * height
    # review r5 wave 2: a pixel offset inside the 54-byte header would
    # silently decode header bytes as pixels; zero height would emit an
    # empty sample array whose .min() fails downstream with an opaque
    # numpy error instead of this decoder's loud contract
    if width <= 0 or height == 0 or off < 54 or len(payload) < need:
        raise ValueError("malformed BMP payload (bad offset/dimensions "
                         "or truncated pixel data)")
    rows = (np.frombuffer(payload, dtype=np.uint8, count=stride * height,
                          offset=off)
            .reshape(height, stride)[:, :width * 3]
            .reshape(height, width, 3))
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].astype(np.float64).ravel()  # BGR → RGB


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL audio decode, pure numpy: RIFF/WAVE PCM (8-bit unsigned or
    16-bit signed little-endian), proper chunk walk (fmt may be followed
    by LIST/fact chunks before data). Returns interleaved samples as
    float64 — 16-bit as-is, 8-bit recentred to signed. Loud ValueError
    on non-PCM or malformed containers."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if len(body) < sz:
            # review r5: a declared chunk size overrunning the payload is
            # a cut-off transfer — silently decoding the partial samples
            # would hand downstream plausible-looking features
            raise ValueError(f"truncated WAV chunk {cid!r} (declares {sz} "
                             f"bytes, {len(body)} present)")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV variant (format={audio_format}, "
                         f"bits={bits}); only PCM 8/16-bit is decoded "
                         f"natively")
    if bits == 16:
        if len(data) % 2:
            # review r5 wave 2: an odd-length 16-bit data chunk is the
            # same corrupt-container class as an overrunning one —
            # silently dropping the trailing byte would contradict the
            # truncation guard above
            raise ValueError("malformed WAV: odd data-chunk length for "
                             "16-bit PCM")
        return np.frombuffer(data, dtype="<i2").astype(np.float64)
    return np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0


def numpy_decoder(payload: bytes, media_type: str) -> np.ndarray:
    """The no-library REAL decoder for media_features(decoder=...): BMP
    for 'image', WAV for 'audio' (both parsed in pure numpy above). Other
    media types raise NotImplementedError — the honest boundary where a
    compressed-format library would plug into the same seam."""
    if media_type == "image":
        return decode_bmp(payload)
    if media_type == "audio":
        return decode_wav(payload)
    raise NotImplementedError(
        f"native decode for media_type={media_type!r} (inject a library "
        f"decoder for compressed formats)")


def media_features(media: DataFrame, decoder=None) -> DataFrame:
    """BINARY payload → metadata + feature vector via mapInPandas.

    `decoder(payload_bytes, media_type) -> np.ndarray` is the SWAP SEAM
    for a real image/audio decoder (PIL/librosa are absent in this
    environment — the default _decode_payload is an honestly-stubbed
    deterministic fake). The decoder is captured INSIDE the mapInPandas
    closure, so an injected implementation is pickled by value and
    reaches the Python workers — module monkeypatching would not (workers
    re-import the module); the swap seam is test-gated with a custom
    decoder end-to-end."""
    decoder = decoder or _decode_payload

    def _extract(batches):
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(pdf["doc_id"], pdf["media_type"],
                                           pdf["payload"]):
                data = bytes(payload)
                px = decoder(data, mt)
                # 4-dim feature: mean, std, min, max of the decoded samples
                feat = [float(px.mean()), float(px.std()),
                        float(px.min()), float(px.max())]
                rows.append((int(doc_id), len(data),
                             hashlib.sha256(data).hexdigest(), feat))
            yield pd.DataFrame(rows, columns=["doc_id", "n_bytes",
                                              "sha256", "feature"])

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter for the driver testdata: treat each document's utf-8 bytes as
    an opaque payload (media_type='blob') — exercises the full multimodal
    dataflow on real Arrow batches."""
    return documents.select(
        "doc_id",
        F.lit("blob").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"))


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_no", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
])


def media_frame_sample(media: DataFrame, frame_bytes: int = 256,
                       stride: int = 2) -> DataFrame:
    """Frame sampling: chunk each payload into fixed-size byte frames and
    keep every `stride`-th — the video/audio frame-sample plumbing (the
    decode itself stays stubbed). At 100 TB the point is the dataflow:
    one input row fans out to many frame rows inside mapInPandas (Arrow
    batches in, a frame table out), each of which a real decoder task
    would consume; schema, fan-out shape, and determinism are exercised
    for real and oracled."""
    def _frames(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) - 1) // frame_bytes + 1 if data else 0
                for i in range(0, n_frames, stride):
                    chunk = data[i * frame_bytes:(i + 1) * frame_bytes]
                    rows.append((int(doc_id), i, len(chunk),
                                 hashlib.sha256(chunk).hexdigest()))
            yield pd.DataFrame(rows,
                               columns=["doc_id", "frame_no",
                                        "n_bytes", "sha256"])

    return media.mapInPandas(_frames, FRAMES_SCHEMA)


def media_metadata(documents: DataFrame) -> DataFrame:
    """SQL-expressible slice of the multimodal output (n_bytes + sha256) —
    this is what the DuckDB oracle checks; the feature vector itself is
    covered by unit tests."""
    feats = media_features(documents_as_media(documents))
    return feats.select("doc_id", F.col("n_bytes").cast("long").alias("n_bytes"), "sha256")
