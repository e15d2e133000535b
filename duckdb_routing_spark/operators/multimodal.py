"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

Three decoders:
  - decoder='fake': deterministic stub (md5-derived), always available.
  - decoder='stdlib': REAL decode of PNG/24-bit-BMP payloads built on the
    standard library alone (operators/imagecodec.py — zlib inflate, all
    five PNG filters, integer BT.601 grayscale, deterministic resize), so
    the real-decode branch runs end to end even in this codec-library-free
    container (tests/test_llm_operators.py round-trips compressed PNG bytes
    through it unconditionally).
  - decoder='pil': real decode via pillow, gated at RUNTIME — raises a
    clearly-marked NotImplementedError when PIL is absent from the executor
    environment. `make pil-check` (optional, needs network) installs
    pillow and drives this branch for real; in environments that ship it,
    the same tests exercise it automatically.

Everything around the decode is identical across decoders and tested: the
schema contract, the binary payload handling, the Arrow batch iteration
shape, and the partitioning story (media tables partition by content hash
so one huge video never skews a task).
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


def synthesize_png_media(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Media table whose payloads are REAL compressed PNG bytes (stdlib
    encoder), derived deterministically from each document: a 12x10 RGB
    image seeded by the text's md5, rows filtered round-robin so every PNG
    filter type appears in the corpus. Runs executor-side (mapInPandas) —
    payloads are born distributed, never on the driver. Feeds the
    decoder='stdlib'/'pil' REAL-decode paths in tests and demos."""
    from duckdb_routing_spark.operators import imagecodec

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, payloads, metas = [], [], [], []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                seed = np.frombuffer(
                    hashlib.md5(str(text).encode("utf-8")).digest(), dtype=np.uint8
                )
                base = np.add.outer(
                    np.arange(10, dtype=np.int32) * 7, np.arange(12, dtype=np.int32) * 11
                )
                img = np.stack(
                    [(base + int(seed[c])) % 256 for c in range(3)], axis=2
                ).astype(np.uint8)
                png = imagecodec.encode_png(img, filter_type=int(mid) % 5)
                ids.append(mid)
                types.append("image/png")
                payloads.append(png)
                metas.append({"n_bytes": len(png), "width": 12, "height": 10})
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "payload": payloads, "meta": metas}
            )

    return docs.select(id_col, text_col).mapInPandas(run, MEDIA_SCHEMA)


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


def _stdlib_decode_features(payload: bytes) -> np.ndarray:
    """Real decode without PIL: stdlib PNG/BMP -> 4x4 grayscale -> 16
    floats (operators/imagecodec.py; deterministic integer pipeline)."""
    from duckdb_routing_spark.operators import imagecodec

    return imagecodec.decode_gray_patch(payload, (4, 4)).astype(np.float32).flatten() / 255.0


_FEATURE_DECODERS = {
    "fake": _fake_decode_features,
    "pil": _pil_decode_features,
    "stdlib": _stdlib_decode_features,
}


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    decoder='fake' uses the deterministic stub; 'stdlib' really decodes
    PNG/BMP payloads with the dependency-free codec; 'pil' is the
    pillow path and raises until the library is available. The batch shape
    is the real contract: one pandas batch in, one out, payloads never
    round-trip through the driver."""
    if decoder not in _FEATURE_DECODERS:
        raise ValueError(f"unknown decoder: {decoder}")

    decode = _FEATURE_DECODERS[decoder]

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
    if decoder not in ("fake", "pil", "stdlib"):
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

    def _stdlib_patch(b: bytes) -> np.ndarray:
        from duckdb_routing_spark.operators import imagecodec

        return imagecodec.decode_gray_patch(b, (9, 8)).astype(np.int32)

    to_patch = {"pil": _pil_patch, "stdlib": _stdlib_patch, "fake": _fake_patch}[decoder]

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
