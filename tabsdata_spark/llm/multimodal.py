"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode step is STUBBED (image/audio libs are not in this container):
`set_decoder(...)` plugs a real decoder in; the default deterministic fake
decoder lets the Spark-side plumbing — schema, partitioning, UDF signature,
Arrow batch shape — be fully real and tested.  At 100 TB the pattern is:
binary payloads stay columnar in Parquet, metadata columns drive partition
pruning, and decode happens executor-side in Arrow batches sized by
`spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

#: media metadata schema attached alongside the binary payload
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),      # image|audio|video
    T.StructField("format", T.StringType()),          # png|jpeg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("size_bytes", T.LongType()),
])


def _fake_decode_image(payload: bytes) -> dict:
    """Deterministic fake decode: derives pseudo-dimensions and a 8-dim
    'feature' from the payload digest.  Replace via set_decoder()."""
    h = hashlib.sha256(payload).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "features": [round(b / 255.0, 6) for b in h[2:10]],
    }


def _default_decoder(payload: bytes) -> dict:
    """REAL decode for formats whose specs need no external libs (BMP,
    PCM WAV — llm/codecs.py); deterministic fake for everything else so
    the plumbing stays testable without image/audio libraries."""
    from . import codecs

    if codecs.sniff_format(payload) is not None:
        return codecs.decode_media(payload)
    return _fake_decode_image(payload)


_DECODER: Callable[[bytes], dict] = _default_decoder


def set_decoder(fn: Callable[[bytes], dict]) -> None:
    """Plug a real decoder (e.g. PIL-based).  Must return a dict with
    width/height/features keys."""
    global _DECODER
    _DECODER = fn


def attach_media_metadata(df: DataFrame, binary_col: str = "payload",
                          media_type: str = "image", fmt: str = "bin") -> DataFrame:
    """Cheap metadata without decoding: size, type tags.  JVM-only."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("size_bytes"),
        ),
    )


DECODE_SCHEMA_SUFFIX = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
]


def decode_and_featurize(df: DataFrame, id_col: str = "doc_id",
                         binary_col: str = "payload") -> DataFrame:
    """mapInPandas decode: Arrow batches of binary payloads -> decoded
    metadata + feature vector.  One Python crossing per batch, not per row;
    partition count controls decode parallelism on the cluster."""
    import pandas as pd

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + DECODE_SCHEMA_SUFFIX
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    rows.append((_id, None, None, None))
                    continue
                d = _DECODER(bytes(payload))
                rows.append((_id, d["width"], d["height"], d["features"]))
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "features"])

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def resize_images(df: DataFrame, id_col: str = "doc_id",
                  binary_col: str = "payload", width: int = 224,
                  height: int = 224) -> DataFrame:
    """Executor-side image resize.  REAL for BMP payloads (pure-numpy
    nearest-neighbor kernel, llm/codecs.py); other formats raise the
    documented gate — jpeg/png need an image library this container
    lacks."""
    import pandas as pd

    from . import codecs

    def run(batches):
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    rows.append((_id, None))
                    continue
                b = bytes(payload)
                if codecs.sniff_format(b) != "bmp":
                    raise NotImplementedError(
                        "resize is implemented for BMP; jpeg/png need an "
                        "image library not present in this container "
                        "(plug one in via a custom mapInPandas kernel)")
                rows.append((_id, codecs.resize_bmp(b, width, height)))
            yield pd.DataFrame(rows, columns=[id_col, "resized"])

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ])
    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  binary_col: str = "payload",
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling: emits (id, frame_idx, frame_bytes) rows.
    REAL for uncompressed AVI payloads (codecs.sample_avi_frames —
    evenly-spaced frames re-encoded as standalone BMPs, feeding the image
    decode/featurize/resize path); other payloads keep the deterministic
    fake so the plumbing (schema, batching, explode shape) is exercised
    for formats whose decoders need external libs."""
    import pandas as pd

    from .codecs import sample_avi_frames, sniff_format

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if sniff_format(payload) == "avi":
                    for i, bmp in sample_avi_frames(payload, max_frames):
                        rows.append((_id, i, bmp))
                    continue
                n_frames = max(1, len(payload) // 64)
                for i in range(min(n_frames, max_frames)):
                    rows.append((_id, i, payload[i * 8: i * 8 + 8]))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def ahash_images(df: DataFrame, id_col: str = "doc_id",
                 binary_col: str = "payload",
                 grid: int = 8) -> DataFrame:
    """Perceptual average-hash (aHash) of image payloads: decode, block-
    average the luma-free mean channel down to a grid x grid thumbnail,
    threshold each cell against the global pixel mean, and pack the bit
    matrix row-major — the classic 64-bit perceptual fingerprint that
    survives re-encoding and small edits, the image-side analog of
    MinHash for near-duplicate detection.

    Returns (id, h1, h2, ahash_hex): the hash as two UNSIGNED 32-bit
    halves in bigints (bits 0-31 / 32-63 — engine-portable: a packed
    signed int64 flips sign across engines) plus the hex rendering.
    Decode runs through the registered codec (real spec-level BMP; other
    formats per the declared gates) one Arrow batch per crossing.

    Cell semantics: the image divides into a grid x grid array of
    EQUAL integer blocks (width/height must be divisible by `grid` —
    the resize step upstream guarantees it in a real pipeline); cell
    mean >= global mean (strict float64 sums / exact pixel counts) sets
    the bit."""
    import pandas as pd

    from . import codecs

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("h1", T.LongType()),
        T.StructField("h2", T.LongType()),
        T.StructField("ahash_hex", T.StringType()),
    ])

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    rows.append((_id, None, None, None))
                    continue
                raw = bytes(payload)
                if codecs.sniff_format(raw) != "bmp":
                    raise ValueError(
                        "ahash_images decodes images only (spec-level BMP "
                        "here; jpeg/png need a real image library — "
                        "multimodal.set_decoder)")
                d = codecs.decode_bmp(raw)
                px = d["pixels"].astype(np.float64).mean(axis=2)  # (H, W)
                h, w = px.shape
                bh, bw = h // grid, w // grid
                cells = px[:bh * grid, :bw * grid] \
                    .reshape(grid, bh, grid, bw).mean(axis=(1, 3))
                bits = (cells >= px.mean()).astype(np.uint64).ravel()
                val = 0
                for i, b in enumerate(bits):
                    val |= int(b) << i
                rows.append((_id, val & 0xFFFFFFFF, val >> 32,
                             f"{val:016x}"))
            yield pd.DataFrame(rows, columns=[id_col, "h1", "h2",
                                              "ahash_hex"])

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def image_patches(df: DataFrame, id_col: str = "doc_id",
                  binary_col: str = "payload",
                  grid: int = 4) -> DataFrame:
    """ViT-style patch featurization: decode, gray-average the
    channels, split into a grid x grid array of EQUAL integer blocks,
    and emit one row per patch with the EXACT integer pixel sum and
    its mean — the patch-embedding front end of an image tower
    (downstream projection is a matmul over these block statistics).

    Exactness contract: gray values of equal-channel images are exact
    integers in float64; each patch sum accumulates < 2^53 so it is
    exact, surfaced as BIGINT; the mean is half-up micros --
    floor(sum*1e6/count + 0.5)/1e6 -- because python round() is
    banker's and engine ROUND() is half-away (the udf_element_tier
    lesson), and integer/48 hits 6-decimal half boundaries.

    Scale shape: one mapInPandas pass, one row per (image, patch) —
    output is grid^2 x images, no shuffle."""
    import pandas as pd

    from . import codecs

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("patch_row", T.IntegerType()),
        T.StructField("patch_col", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("pixel_mean", T.DoubleType()),
    ])

    def run(batches):
        import numpy as np

        for pdf in batches:
            ids, prs, pcs, sums, means = [], [], [], [], []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if codecs.sniff_format(raw) != "bmp":
                    raise ValueError(
                        "image_patches decodes images only (spec-level "
                        "BMP here; jpeg/png need a real image library — "
                        "multimodal.set_decoder)")
                d = codecs.decode_bmp(raw)
                # channel mean of an equal-channel image is the exact
                # integer channel value; sum in int64 (never float)
                px = d["pixels"].astype(np.int64)
                gray3 = px.sum(axis=2)          # 3 * gray, exact ints
                h, w = gray3.shape
                bh, bw = h // grid, w // grid
                blocks = (gray3[:bh * grid, :bw * grid]
                          .reshape(grid, bh, grid, bw)
                          .sum(axis=(1, 3)))    # int64 patch sums of 3*v
                cnt = 3 * bh * bw
                import math

                for r in range(grid):
                    for c in range(grid):
                        s = int(blocks[r, c])
                        ids.append(int(_id))
                        prs.append(r)
                        pcs.append(c)
                        sums.append(s)
                        means.append(
                            math.floor(s * 1e6 / cnt + 0.5) / 1e6)
            yield pd.DataFrame({id_col: ids, "patch_row": prs,
                                "patch_col": pcs, "pixel_sum": sums,
                                "pixel_mean": means})

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)


def image_near_dup_pairs(hashes: DataFrame, id_col: str = "doc_id",
                         max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs from aHash fingerprints by banded
    blocking + exact Hamming verification: the 64-bit hash splits into
    four 16-bit bands; candidate pairs come ONLY from an equi-join on
    (band index, band value) — by pigeonhole, any pair within Hamming
    distance 3 shares at least one untouched band, so recall at
    max_hamming <= 3 is EXACT while the join never goes all-pairs.

    Exact verification: hamming = bit_count(h1a XOR h1b) +
    bit_count(h2a XOR h2b), pure JVM expressions.  Returns
    (id_a, id_b, hamming) with id_a < id_b."""
    b0 = F.col("h1").bitwiseAND(F.lit(0xFFFF))
    b1 = F.shiftrightunsigned(F.col("h1"), 16).bitwiseAND(F.lit(0xFFFF))
    b2 = F.col("h2").bitwiseAND(F.lit(0xFFFF))
    b3 = F.shiftrightunsigned(F.col("h2"), 16).bitwiseAND(F.lit(0xFFFF))
    banded = hashes.select(
        F.col(id_col), "h1", "h2",
        F.posexplode(F.array(b0, b1, b2, b3)).alias("band", "bval"))
    a = banded.select(F.col(id_col).alias("id_a"),
                      F.col("h1").alias("__h1a"),
                      F.col("h2").alias("__h2a"), "band", "bval")
    b = banded.select(F.col(id_col).alias("id_b"),
                      F.col("h1").alias("__h1b"),
                      F.col("h2").alias("__h2b"), "band", "bval")
    cand = (a.join(b, ["band", "bval"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__h1a", "__h2a", "__h1b", "__h2b")
            .distinct())
    ham = (F.bit_count(F.col("__h1a").bitwiseXOR(F.col("__h1b")))
           + F.bit_count(F.col("__h2a").bitwiseXOR(F.col("__h2b"))))
    return (cand.select("id_a", "id_b",
                        ham.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def audio_fingerprint(df: DataFrame, id_col: str = "doc_id",
                      binary_col: str = "payload",
                      blocks: int = 32) -> DataFrame:
    """Robust audio fingerprint from PCM payloads (Haitsma-Kalker shape,
    time-domain variant): decode, split the signal into `blocks` equal
    windows, take each window's ENERGY (exact integer sum of squared
    int16 samples — scale-free under the codec's /32768 normalization),
    and emit one bit per adjacent-window energy INCREASE — a
    blocks-1-bit fingerprint that survives level changes and container
    re-encoding, the audio-side analog of the image aHash.

    Returns (id, fp, n_blocks, duration_ms); fp packs bit b =
    [energy(b+1) > energy(b)] at position b (fits a signed 64-bit long
    for blocks <= 64).  Exact-match on fp is the dedup key; banded
    Hamming (image_near_dup_pairs on split halves) generalizes to
    near-match."""
    import pandas as pd

    from . import codecs

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("fp", T.LongType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])

    def run(batches):
        import numpy as np

        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    rows.append((_id, None, None, None))
                    continue
                d = codecs.decode_wav(bytes(payload))
                s = np.rint(d["samples"] * 32768.0).astype(np.int64)
                n = (len(s) // blocks) * blocks
                e = (s[:n] ** 2).reshape(blocks, -1).sum(axis=1)
                fp = 0
                for b in range(blocks - 1):
                    if e[b + 1] > e[b]:
                        fp |= 1 << b
                rows.append((_id, fp, blocks, d["duration_ms"]))
            yield pd.DataFrame(rows, columns=[id_col, "fp", "n_blocks",
                                              "duration_ms"])

    return df.select(id_col, binary_col).mapInPandas(run, out_schema)
