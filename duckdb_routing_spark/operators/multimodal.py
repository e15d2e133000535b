"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

The decode step is gated at RUNTIME on the codec library: decoder='pil'
decodes real images when PIL is importable in the executor environment and
raises a clearly-marked NotImplementedError when it isn't (this image ships
no codecs); decoder='fake' is the deterministic stub either way. Everything
around the gate is real and tested: the schema contract, the binary payload
handling, the Arrow batch iteration shape, and the partitioning story
(media tables partition by content hash so one huge video never skews a
task). tests/test_llm_operators.py drives the 'pil' path for real whenever
the environment has PIL and asserts the gate otherwise.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from the documents fixture: the text's
    utf-8 bytes stand in for an encoded image; metadata is derived
    arithmetically (same construction as the multimodal_meta oracle query)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
            (64 + F.length(F.col(text_col)) % 512).cast("int").alias("width"),
            (64 + (F.length(F.col(text_col)) * 7) % 512).cast("int").alias("height"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image-embedding model: 16 floats
    from the md5 digest, scaled to [0, 1)."""
    digest = hashlib.md5(payload).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 256.0


def _pil_gray(payload: bytes, size: tuple[int, int]) -> np.ndarray:
    """Real decode: payload -> grayscale patch of `size` (w, h) as uint8
    HxW. Raises NotImplementedError when PIL is absent from the runtime —
    the documented capability gate, checked where the work happens (the
    executor) so a cluster with codecs installed just works."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL (pillow) in the executor "
            "environment; use decoder='fake' for the deterministic stub"
        ) from exc
    import io  # noqa: PLC0415

    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("L").resize(size, Image.BILINEAR), dtype=np.uint8)


def _pil_decode_features(payload: bytes) -> np.ndarray:
    """Real image feature stub-of-a-model: 4x4 grayscale thumbnail -> 16
    floats in [0, 1] (decode/resize are real; swap the tail for a model)."""
    return _pil_gray(payload, (4, 4)).astype(np.float32).flatten() / 255.0


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    decoder='fake' uses the deterministic stub; decoder='pil' is the real
    path and raises until an image library is available. The batch shape is
    the real contract: one pandas batch in, one out, payloads never
    round-trip through the driver."""
    if decoder not in ("fake", "pil"):
        raise ValueError(f"unknown decoder: {decoder}")

    decode = _pil_decode_features if decoder == "pil" else _fake_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p)) if p is not None else None for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling shape for video payloads: explode one payload row into
    per-"frame" rows (here: one row per every_n_bytes chunk) — the partition-
    explosion pattern a real video pipeline needs, without a codec."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, chunks = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                for i in range(0, len(b), every_n_bytes):
                    ids.append(mid)
                    nos.append(i // every_n_bytes)
                    chunks.append(b[i : i + every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame_bytes": chunks})

    return media.mapInPandas(run, schema)


def perceptual_hash(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """64-bit dHash per media row: (media_id, phash_hi, phash_lo).

    The real-image shape end to end: decode -> downsample to an 8x9
    grayscale patch -> horizontal gradient sign bits (classic dHash: each
    of the 8 rows compares its 9 columns pairwise -> 64 bits).
    decoder='fake' derives the patch deterministically from the payload
    bytes (md5-seeded tiling of the byte stream — the stub documented in
    extract_features); decoder='pil' raises until an image library is
    present. Identical payloads always collide; near-identical patches
    differ in few bits — which is what the banded lookup below exploits.
    Arrow-batched mapInPandas; payloads never visit the driver. Split into
    two UNSIGNED 32-bit halves in BIGINT — simhash64's exact layout — so
    the banded join and its bit_count hamming reuse
    `dedup.simhash64_hamming_pairs` unchanged."""
    if decoder not in ("fake", "pil"):
        raise ValueError(f"unknown decoder: {decoder}")

    def _fake_patch(b: bytes) -> np.ndarray:
        # deterministic 8x9 patch: tile the payload bytes, then one
        # md5-derived perturbation per cell so short payloads still
        # fill the grid; a zero-byte payload falls back to the md5
        # base alone (md5(b'') is well-defined)
        base = np.frombuffer(hashlib.md5(b).digest(), dtype=np.uint8)
        raw = np.frombuffer(b, dtype=np.uint8)
        if len(raw) == 0:
            raw = base
        idx = np.arange(72)
        return (
            raw[idx % len(raw)].astype(np.int32) + base[idx % 16].astype(np.int32)
        ).reshape(8, 9)

    def _pil_patch(b: bytes) -> np.ndarray:
        # real decode: 9-wide x 8-tall grayscale thumbnail (classic dHash)
        return _pil_gray(b, (9, 8)).astype(np.int32)

    to_patch = _pil_patch if decoder == "pil" else _fake_patch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            his, los = [], []
            for p in pdf["payload"]:
                if p is None:
                    his.append(None)
                    los.append(None)
                    continue
                patch = to_patch(bytes(p))
                bits = (patch[:, 1:] > patch[:, :-1]).flatten()  # 8x8 horizontal signs
                v = 0
                for bit in bits:
                    v = (v << 1) | int(bit)
                # UNSIGNED halves (0..2^32-1) in BIGINT — the layout
                # simhash64 emits; a signed view would sign-extend through
                # bit_count(XOR) and inflate hamming by 32 whenever bit 31
                # differs, silently killing true near-dup pairs
                his.append((v >> 32) & 0xFFFFFFFF)
                los.append(v & 0xFFFFFFFF)
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash_hi": his, "phash_lo": los})

    return media.mapInPandas(run, "media_id long, phash_hi long, phash_lo long")


def perceptual_near_dup_pairs(media: DataFrame, max_hamming: int = 3, decoder: str = "fake") -> DataFrame:
    """Image near-dup candidates: dHash signatures -> 4x16-bit banded
    equi-join within `max_hamming` (pigeonhole-lossless, no crossJoin) —
    the image analog of the text SimHash pipeline, sharing its banding
    kernel. Output (doc_a, doc_b, hamming)."""
    from duckdb_routing_spark.operators import dedup

    sig = perceptual_hash(media, decoder=decoder).select(
        F.col("media_id").alias("doc_id"),
        F.col("phash_hi").alias("sim_hi"),
        F.col("phash_lo").alias("sim_lo"),
    )
    return dedup.simhash64_hamming_pairs(sig, max_hamming=max_hamming)
