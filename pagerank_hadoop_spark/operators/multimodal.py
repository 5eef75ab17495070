"""Multimodal (image/audio/video) column plumbing ([EXT] E5).

Media payloads are opaque ``binary`` columns plus a typed metadata
struct — the columnar pattern for multimodal training data. The Spark
side (schema, partition sizing, Arrow batch shape, UDF signatures) is
real and tested. Codec status:

* **Uncompressed formats decode for real**: pure-Python header
  parsers for BMP (:func:`parse_bmp_header`) and RIFF/WAVE
  (:func:`parse_wav_header`) run inside the Arrow batch kernels —
  no external libraries needed, and the results are oracle-checked
  against fixture files constructed in-query (``media_bmp_meta`` /
  ``media_wav_meta``).
* PNG decodes for real END TO END (:func:`png_pixel_stats`
  greyscale-8, :func:`png_palette_stats` color type 3,
  :func:`png_rgb_stats` truecolor with the spec's bpp filter
  distance, and Adam7 INTERLACED variants of all three via
  :func:`_png_unfilter_adam7`): IDAT chunks are concatenated,
  inflated with stdlib :mod:`zlib`, and all five scanline filters
  (None/Sub/Up/Average/Paeth) are reversed per the PNG spec — no
  external library, oracle-checked against in-query fixtures whose
  filtered bytes both engines derive from the same arithmetic
  (``media_png_pixels`` / ``media_png_palette`` /
  ``media_png_rgb``); interlaced decode is unit-gated on genuinely
  compressed Adam7 files. PNG metadata alone is
  :func:`parse_png_meta`.
* GIF decodes for real too: :func:`lzw_decode_gif` is a complete
  GIF-variant LZW decompressor (variable code width, CLEAR/EOI,
  KwKwK), :func:`gif_pixel_stats` walks the container and maps
  indices through the global color table (``media_gif_pixels``);
  frame counts without decode are :func:`parse_gif_meta`
  (block-walking). WAV gains real spectral analysis
  (:func:`wav_dominant_freq`, NumPy rFFT).
* Codecs that genuinely need external LIBRARIES (JPEG/MP4) remain STUBBED because the
  image/audio libraries are not in this container: ``decode_media``
  with ``strict=True`` raises ``NotImplementedError`` for payloads
  that are not BMP/WAV (the production path would call the codec);
  with ``strict=False`` unrecognized payloads get a deterministic
  fake decode (dimensions derived from a hash of the payload) so the
  pipeline shape stays exercisable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def parse_bmp_header(payload: bytes) -> tuple[int, int, int] | None:
    """Parse a Windows BMP (BITMAPINFOHEADER) header; returns
    ``(width, height, bits_per_pixel)`` or None if the payload is not
    a plausible BMP. Pure byte arithmetic — the real decode for the
    one image format that needs no codec library. Top-down BMPs store
    a negative height; we return its magnitude (the orientation does
    not change the raster dimensions)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    bi_size = int.from_bytes(payload[14:18], "little")
    if bi_size < 40:  # BITMAPCOREHEADER etc. not supported
        return None
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    planes = int.from_bytes(payload[26:28], "little")
    bpp = int.from_bytes(payload[28:30], "little")
    if width <= 0 or height == 0 or planes != 1 or bpp == 0:
        return None
    return width, abs(height), bpp


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a RIFF/WAVE (PCM) file; returns ``(channels,
    sample_rate, bits_per_sample, n_samples)`` or None if not a
    plausible WAV. Walks the chunk list (fmt may not be the first
    chunk) and derives n_samples from the data chunk size — again
    pure byte arithmetic, no codec."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16 and fmt is None:
            fmt = (
                int.from_bytes(body[2:4], "little"),  # channels
                int.from_bytes(body[4:8], "little"),  # sample rate
                int.from_bytes(body[14:16], "little"),  # bits/sample
            )
        elif cid == b"data" and data_size is None:
            # FIRST data chunk (matches wav_sample_stats' decode);
            # clamp to the bytes actually present so a truncated
            # chunk yields an n_samples consistent with the decode.
            data_size = min(csize, max(0, len(payload) - pos - 8))
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    channels, rate, bits = fmt
    # bits must be a positive multiple of 8: a sub-byte or zero frame
    # size is not PCM we can address (and would divide by zero below).
    if channels == 0 or rate == 0 or bits < 8 or bits % 8:
        return None
    frame = channels * (bits // 8)
    n_samples = data_size // frame
    return channels, rate, bits, n_samples


def attach_media(df: DataFrame, payload_col, media_type: str = "image/fake") -> DataFrame:
    """Wrap a binary column into the standard media schema: payload +
    typed metadata (size, digest) computed JVM-side."""
    return df.select(
        F.col(df.columns[0]).cast("long").alias("media_id"),
        payload_col.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload_col).cast("int").alias("n_bytes"),
        F.sha2(payload_col, 256).alias("sha"),
    )


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode media payloads via mapInPandas.

    BMP payloads decode for real (:func:`parse_bmp_header` — header
    arithmetic, no codec library); WAV payloads map to (width=sample
    rate, height=channels, n_frames=sample count). Other formats:
    ``strict=True`` raises ``NotImplementedError`` (the production
    path would call the codec), ``strict=False`` yields a
    deterministic hash-derived fake so the pipeline shape stays
    exercisable.

    Arrow-batched: each batch arrives as a pandas DataFrame; the
    per-batch loop is a per-row header parse (tens of ns) — cheap
    next to Arrow transfer. Partition sizing guidance for 100 TB:
    keep ``spark.sql.files.maxPartitionBytes`` at 128–256 MB so one
    task's payload batch fits executor memory alongside the decode
    buffers.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def dims(payload: bytes) -> tuple[int, int, int]:
            bmp = parse_bmp_header(payload)
            if bmp is not None:
                return bmp[0], bmp[1], 1
            gif = parse_gif_meta(payload)
            if gif is not None:
                return gif
            wav = parse_wav_header(payload)
            if wav is not None:
                channels, rate, _bits, n_samples = wav
                return rate, channels, n_samples
            if strict:
                raise NotImplementedError(
                    "payload is neither BMP nor WAV; compressed-codec "
                    "decode requires libraries not present in this "
                    "environment — run with strict=False for the "
                    "deterministic fake decode"
                )
            h = hashlib.sha256(payload).digest()
            return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 16

        for pdf in it:
            d = pdf["payload"].map(dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": d.map(lambda t: t[0]).astype("int32"),
                    "height": d.map(lambda t: t[1]).astype("int32"),
                    "n_frames": d.map(lambda t: t[2]).astype("int32"),
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


WAV_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def decode_wav(media: DataFrame) -> DataFrame:
    """Real WAV decode: chunk-walking RIFF parse per payload
    (:func:`parse_wav_header`) → audio metadata incl. integral
    duration_ms. Raises on non-WAV payloads (this is the typed audio
    path; route mixed media through :func:`decode_media`)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes):
            wav = parse_wav_header(payload)
            if wav is None:
                raise ValueError("payload is not a RIFF/WAVE file")
            channels, rate, bits, n_samples = wav
            return channels, rate, bits, n_samples, n_samples * 1000 // rate

        for pdf in it:
            d = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "channels": d.map(lambda t: t[0]).astype("int32"),
                    "sample_rate": d.map(lambda t: t[1]).astype("int32"),
                    "bits": d.map(lambda t: t[2]).astype("int32"),
                    "n_samples": d.map(lambda t: t[3]).astype("int32"),
                    "duration_ms": d.map(lambda t: t[4]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, WAV_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling plan: explode sampled frame indices per video —
    pure relational (sequence + explode), no decode needed."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_media(
    decoded: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Aspect-preserving resize plan: output dimensions for a
    fit-within-(target_w x target_h) resample. Pure Column arithmetic
    (the pixel resample itself belongs in the decode UDF); adds
    ``out_width``/``out_height``/``scale``."""
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"),
        F.lit(float(target_h)) / F.col("height"),
    )
    return decoded.select(
        "*",
        scale.alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
    )


FEATURE_DIM = 16


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction plumbing: payload -> embedding
    (array<float>) via Arrow-batched mapInPandas — the bridge from
    media columns into the similarity-search operators. The real model
    forward pass is stubbed with a deterministic digest-derived
    vector; batch shape, schema, and partition sizing are the
    production ones."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def vec(payload: bytes) -> list[float]:
            # chain suffix is ASCII str(i), not bytes([i]): keeps the
            # fake SQL-expressible (a NUL byte can't ride a VARCHAR),
            # which is what lets the oracle value-check this path
            out: list[float] = []
            i = 0
            while len(out) < dim:
                h = hashlib.sha256(payload + str(i).encode()).digest()
                out.extend(b / 255.0 - 0.5 for b in h)
                i += 1
            return out[:dim]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "embedding": pdf["payload"].map(vec),
                }
            )

    return media.mapInPandas(batches, schema)


PIXEL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_px", LongType()),
        StructField("b_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("r_sum", LongType()),
    ]
)


def bmp_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL raster decode: per-channel pixel sums of 24-bit BMP
    payloads (BGR order, bottom-up or top-down — channel sums are
    orientation-invariant). NumPy over the raster bytes inside the
    Arrow batch kernel; integer sums, so the result is exact and
    engine-portable with no float discipline. Raises on non-BMP or
    non-24bpp payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def stats(payload: bytes):
            hdr = parse_bmp_header(payload)
            if hdr is None or hdr[2] != 24:
                raise ValueError("payload is not a 24-bit BMP")
            w, h, _bpp = hdr
            off = int.from_bytes(payload[10:14], "little")
            stride = (w * 3 + 3) // 4 * 4
            arr = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=off
            ).reshape(h, stride)[:, : w * 3]
            px = arr.reshape(-1, 3).astype(np.int64)
            sums = px.sum(axis=0)
            return w * h, int(sums[0]), int(sums[1]), int(sums[2])

        for pdf in it:
            d = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_px": d.map(lambda t: t[0]).astype("int64"),
                    "b_sum": d.map(lambda t: t[1]).astype("int64"),
                    "g_sum": d.map(lambda t: t[2]).astype("int64"),
                    "r_sum": d.map(lambda t: t[3]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, PIXEL_SCHEMA)


SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
    ]
)


def wav_sample_stats(media: DataFrame) -> DataFrame:
    """REAL sample decode: energy (Σ x², the RMS numerator) and peak
    (max |x|) over the int16 PCM samples of WAV payloads — NumPy
    ``frombuffer`` on the data chunk inside the Arrow kernel.
    Integer arithmetic end-to-end (|x| < 2^15 → x² < 2^30; corpus
    sums stay in int64 up to ~2^33 samples/file). Raises on non-WAV
    or non-16-bit payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def stats(payload: bytes):
            wav = parse_wav_header(payload)
            if wav is None or wav[2] != 16:
                raise ValueError("payload is not a 16-bit PCM WAV")
            pos = 12
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                if cid == b"data":
                    # slice to bytes present (truncated chunk) — the
                    # same clamp parse_wav_header applies, so header
                    # n_samples == decoded sample count always.
                    raw = payload[pos + 8 : pos + 8 + csize]
                    x = np.frombuffer(
                        raw, dtype="<i2", count=len(raw) // 2
                    ).astype(np.int64)
                    return (
                        len(x),
                        int((x * x).sum()),
                        int(np.abs(x).max()) if len(x) else 0,
                    )
                pos += 8 + csize + (csize & 1)
            raise ValueError("no data chunk")

        for pdf in it:
            d = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": d.map(lambda t: t[0]).astype("int64"),
                    "energy": d.map(lambda t: t[1]).astype("int64"),
                    "peak": d.map(lambda t: t[2]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, SAMPLE_SCHEMA)


def parse_gif_meta(payload: bytes) -> tuple[int, int, int] | None:
    """Parse GIF87a/89a structure: ``(width, height, n_frames)`` or
    None if not a plausible GIF. Frames are counted by WALKING the
    block graph — image descriptors, extension blocks, sub-block
    chains, color tables are all skipped by their declared lengths;
    the LZW pixel data itself is never decompressed. This is the real
    metadata pass for animated media: frame COUNT and dimensions
    without a codec."""
    if len(payload) < 13 or payload[:3] != b"GIF" or payload[3:6] not in (
        b"87a",
        b"89a",
    ):
        return None
    width = int.from_bytes(payload[6:8], "little")
    height = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    if packed & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (packed & 0x07))
    frames = 0

    def skip_subblocks(p: int) -> int:
        while p < len(payload):
            n = payload[p]
            p += 1
            if n == 0:
                return p
            p += n
        return p

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                return None
            ipacked = payload[pos + 9]
            pos += 10
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
            frames += 1
        else:
            return None  # unknown block type: not a well-formed GIF
    if frames == 0:
        return None
    return width, height, frames


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def bmp_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) of 24-bit BMP payloads — the
    image near-duplicate fingerprint: grayscale the raster, 8×8
    block-average, threshold each block against the global mean, pack
    the 64 bits. Two visually-near-identical images differ in a few
    bits (compare with ``bit_count(a ^ b)``), which turns image dedup
    into the same hamming-band machinery SimHash uses for text.

    Integer arithmetic end-to-end (sums, floor divisions, strict >),
    so fingerprints are exact and engine-replayable. Requires width
    and height to be multiples of 8 (exact block tiling — real
    pipelines resize first; the resize stage exists separately).
    Blocks tile the raster in FILE row order; base and candidate
    images share orientation, so the comparison is flip-consistent.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def one(payload: bytes) -> int:
            hdr = parse_bmp_header(payload)
            if hdr is None or hdr[2] != 24:
                raise ValueError("payload is not a 24-bit BMP")
            w, h, _bpp = hdr
            if w % 8 or h % 8:
                raise ValueError("aHash needs w, h multiples of 8")
            off = int.from_bytes(payload[10:14], "little")
            stride = (w * 3 + 3) // 4 * 4
            arr = (
                np.frombuffer(
                    payload, dtype=np.uint8, count=stride * h, offset=off
                )
                .reshape(h, stride)[:, : w * 3]
                .reshape(h, w, 3)
                .astype(np.int64)
            )
            gray = arr.sum(axis=2) // 3
            bh, bw = h // 8, w // 8
            means = gray.reshape(8, bh, 8, bw).sum(axis=(1, 3)) // (bh * bw)
            m64 = int(means.sum()) // 64
            bits = (means > m64).flatten()
            v = 0
            for b in range(64):
                if bits[b]:
                    v |= 1 << b
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "ahash": pdf["payload"].map(one).astype("int64"),
                }
            )

    return media.mapInPandas(batches, AHASH_SCHEMA)


def parse_png_meta(payload: bytes) -> tuple[int, int, int, int] | None:
    """Parse a PNG signature + IHDR chunk: ``(width, height,
    bit_depth, color_type)`` or None if not a plausible PNG. Pure
    header arithmetic — the zlib-compressed IDAT stream is never
    touched, which is exactly the metadata pass a 100 TB image-corpus
    profile runs (dims/depth histograms, size filters) before any
    expensive decode."""
    sig = b"\x89PNG\r\n\x1a\n"
    if len(payload) < 33 or payload[:8] != sig:
        return None
    if payload[12:16] != b"IHDR":
        return None
    length = int.from_bytes(payload[8:12], "big")
    if length != 13:
        return None
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    bit_depth = payload[24]
    color_type = payload[25]
    if width <= 0 or height <= 0:
        return None
    return width, height, bit_depth, color_type


PNG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("color_type", IntegerType()),
    ]
)


def decode_png_meta(media: DataFrame) -> DataFrame:
    """PNG metadata decode over the Arrow batch kernel; raises on
    non-PNG payloads (typed image path, like :func:`decode_wav`)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(payload: bytes):
            meta = parse_png_meta(payload)
            if meta is None:
                raise ValueError("payload is not a PNG")
            return meta

        for pdf in it:
            d = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": d.map(lambda t: t[0]).astype("int32"),
                    "height": d.map(lambda t: t[1]).astype("int32"),
                    "bit_depth": d.map(lambda t: t[2]).astype("int32"),
                    "color_type": d.map(lambda t: t[3]).astype("int32"),
                }
            )

    return media.mapInPandas(batches, PNG_SCHEMA)


PNG_PIXEL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_px", LongType()),
        StructField("px_sum", LongType()),
        StructField("px_min", IntegerType()),
        StructField("px_max", IntegerType()),
    ]
)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9, Filter type 4)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, row_bytes: int, height: int, bpp: int):
    """Reverse the five PNG scanline filters: ``raw`` is the inflated
    IDAT stream, one filter byte + ``row_bytes`` bytes per scanline;
    ``bpp`` is bytes per pixel (the spec's filter distance — the
    "left" neighbor of a byte is the corresponding byte ``bpp``
    positions earlier). Returns an (height × row_bytes) uint8 ndarray.

    None/Up are whole-row NumPy ops; Sub/Average/Paeth carry the
    left-byte dependency so they run as per-byte loops on that
    scanline only — the cost profile every real PNG decoder has."""
    import numpy as np

    stride = row_bytes + 1
    if len(raw) != stride * height:
        raise ValueError(
            f"inflated IDAT is {len(raw)} bytes; {row_bytes}x{height}"
            f" rows need {stride * height}"
        )
    out = np.zeros((height, row_bytes), dtype=np.int64)
    for y in range(height):
        ftype = raw[y * stride]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=row_bytes, offset=y * stride + 1
        ).astype(np.int64)
        prev = out[y - 1] if y > 0 else np.zeros(row_bytes, dtype=np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-recursive
            rec = np.empty(row_bytes, dtype=np.int64)
            for x in range(row_bytes):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(a, b, c)
                rec[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec
    return out.astype(np.uint8)


def _png_unfilter_gray8(raw: bytes, width: int, height: int):
    """8-bit single-channel unfilter (grey or palette indices):
    :func:`_png_unfilter` at bpp = 1."""
    return _png_unfilter(raw, width, height, 1)


# Adam7 pass grids: (x0, dx, y0, dy) per spec §8.2
_ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _png_unfilter_adam7(raw: bytes, width: int, height: int, bpp: int):
    """Adam7 deinterlace: the inflated stream is SEVEN concatenated
    sub-images (spec §8.2 grids), each filtered independently
    (:func:`_png_unfilter` within the pass — neighbors are pass
    neighbors, not image neighbors), scattered back onto the full
    raster. Passes whose grid is empty at this size contribute zero
    bytes. Returns (height × width·bpp) uint8, same layout as the
    non-interlaced path."""
    import numpy as np

    out = np.zeros((height, width * bpp), dtype=np.uint8)
    pos = 0
    for x0, dx, y0, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        if pw <= 0 or ph <= 0:
            continue
        nbytes = ph * (pw * bpp + 1)
        sub = _png_unfilter(raw[pos : pos + nbytes], pw * bpp, ph, bpp)
        pos += nbytes
        for r in range(ph):
            y = y0 + r * dy
            row = sub[r].reshape(pw, bpp)
            for s in range(pw):
                x = x0 + s * dx
                out[y, x * bpp : (x + 1) * bpp] = row[s]
    if pos != len(raw):
        raise ValueError(
            f"interlaced IDAT is {len(raw)} bytes; Adam7 passes for"
            f" {width}x{height} at bpp={bpp} need {pos}"
        )
    return out


def png_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL compressed-pixel decode: inflate the PNG IDAT stream with
    stdlib :mod:`zlib` (all IDAT chunks concatenated, per spec §5.6),
    reverse the scanline filters (:func:`_png_unfilter_gray8`), and
    aggregate pixel stats — count, sum, min, max — over the
    reconstructed samples. Greyscale 8-bit, non-interlaced only (the
    typed path raises on anything else — color/sub-byte depths need
    the same unfilter with bpp > 1, not a different algorithm).

    Chunk CRCs are not validated (profile-pass posture, like
    :func:`parse_png_meta`); zlib's Adler-32 over the decompressed
    stream IS validated by ``zlib.decompress`` itself, so a corrupt
    IDAT fails loudly rather than yielding garbage sums."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        def stats(payload: bytes):
            meta = parse_png_meta(payload)
            if meta is None:
                raise ValueError("payload is not a PNG")
            width, height, bit_depth, color_type = meta
            if bit_depth != 8 or color_type != 0:
                raise ValueError(
                    "png_pixel_stats decodes greyscale-8 PNGs only"
                    f" (got depth={bit_depth} color_type={color_type})"
                )
            interlaced = payload[28] == 1  # IHDR interlace byte
            idat = b""
            pos = 8
            while pos + 8 <= len(payload):
                clen = int.from_bytes(payload[pos : pos + 4], "big")
                ctype = payload[pos + 4 : pos + 8]
                if ctype == b"IDAT":
                    idat += payload[pos + 8 : pos + 8 + clen]
                elif ctype == b"IEND":
                    break
                pos += 12 + clen  # len + type + data + CRC
            if not idat:
                raise ValueError("no IDAT chunk")
            raw = zlib.decompress(idat)
            px = (
                _png_unfilter_adam7(raw, width, height, 1)
                if interlaced
                else _png_unfilter_gray8(raw, width, height)
            )
            return (
                px.size,
                int(px.astype("int64").sum()),
                int(px.min()),
                int(px.max()),
            )

        for pdf in it:
            d = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_px": d.map(lambda t: t[0]).astype("int64"),
                    "px_sum": d.map(lambda t: t[1]).astype("int64"),
                    "px_min": d.map(lambda t: t[2]).astype("int32"),
                    "px_max": d.map(lambda t: t[3]).astype("int32"),
                }
            )

    return media.mapInPandas(batches, PNG_PIXEL_SCHEMA)


PNG_RGB_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_px", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
    ]
)


def png_rgb_stats(media: DataFrame) -> DataFrame:
    """REAL truecolor-PNG decode (color type 2, the most common web
    PNG class): inflate IDAT, reverse the scanline filters at
    bpp = 3 (the filter's "left" neighbor is the same channel of the
    previous PIXEL — the part a bpp-naive unfilter gets wrong), and
    aggregate per-channel sums. 8-bit depth, non-interlaced; typed
    path raises otherwise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import numpy as np

        def stats(payload: bytes):
            meta = parse_png_meta(payload)
            if meta is None:
                raise ValueError("payload is not a PNG")
            width, height, bit_depth, color_type = meta
            if bit_depth != 8 or color_type != 2:
                raise ValueError(
                    "png_rgb_stats decodes 8-bit truecolor PNGs only"
                    f" (got depth={bit_depth} color_type={color_type})"
                )
            interlaced = payload[28] == 1
            idat = b""
            pos = 8
            while pos + 8 <= len(payload):
                clen = int.from_bytes(payload[pos : pos + 4], "big")
                ctype = payload[pos + 4 : pos + 8]
                if ctype == b"IDAT":
                    idat += payload[pos + 8 : pos + 8 + clen]
                elif ctype == b"IEND":
                    break
                pos += 12 + clen
            if not idat:
                raise ValueError("no IDAT chunk")
            raw = zlib.decompress(idat)
            px = (
                _png_unfilter_adam7(raw, width, height, 3)
                if interlaced
                else _png_unfilter(raw, width * 3, height, 3)
            ).reshape(height, width, 3).astype(np.int64)
            return (
                width * height,
                int(px[:, :, 0].sum()),
                int(px[:, :, 1].sum()),
                int(px[:, :, 2].sum()),
            )

        for pdf in it:
            d = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_px": d.map(lambda t: t[0]).astype("int64"),
                    "r_sum": d.map(lambda t: t[1]).astype("int64"),
                    "g_sum": d.map(lambda t: t[2]).astype("int64"),
                    "b_sum": d.map(lambda t: t[3]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, PNG_RGB_SCHEMA)


PNG_PALETTE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_px", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
    ]
)


def png_palette_stats(media: DataFrame) -> DataFrame:
    """REAL palettized-PNG decode (color type 3): inflate IDAT,
    reverse the scanline filters over the 8-bit palette INDICES
    (bpp = 1, identical filter algebra to greyscale), then map
    indices through the PLTE chunk to RGB and aggregate per-channel
    sums — the palette path most icon/sprite/web-graphic corpora hit.
    Raises on non-palette payloads, out-of-range indices, or a
    missing/short PLTE (typed path; truncated palettes must fail, not
    read garbage RGB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import numpy as np

        def stats(payload: bytes):
            meta = parse_png_meta(payload)
            if meta is None:
                raise ValueError("payload is not a PNG")
            width, height, bit_depth, color_type = meta
            if bit_depth != 8 or color_type != 3:
                raise ValueError(
                    "png_palette_stats decodes 8-bit palette PNGs only"
                    f" (got depth={bit_depth} color_type={color_type})"
                )
            interlaced = payload[28] == 1
            idat = b""
            plte = None
            pos = 8
            while pos + 8 <= len(payload):
                clen = int.from_bytes(payload[pos : pos + 4], "big")
                ctype = payload[pos + 4 : pos + 8]
                if ctype == b"PLTE":
                    plte = payload[pos + 8 : pos + 8 + clen]
                elif ctype == b"IDAT":
                    idat += payload[pos + 8 : pos + 8 + clen]
                elif ctype == b"IEND":
                    break
                pos += 12 + clen
            if plte is None or len(plte) % 3:
                raise ValueError("missing or malformed PLTE")
            if not idat:
                raise ValueError("no IDAT chunk")
            pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            raw = zlib.decompress(idat)
            idx = (
                _png_unfilter_adam7(raw, width, height, 1)
                if interlaced
                else _png_unfilter_gray8(raw, width, height)
            )
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("palette index out of range")
            rgb = pal[idx.ravel()].astype(np.int64)
            return (
                idx.size,
                int(rgb[:, 0].sum()),
                int(rgb[:, 1].sum()),
                int(rgb[:, 2].sum()),
            )

        for pdf in it:
            d = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_px": d.map(lambda t: t[0]).astype("int64"),
                    "r_sum": d.map(lambda t: t[1]).astype("int64"),
                    "g_sum": d.map(lambda t: t[2]).astype("int64"),
                    "b_sum": d.map(lambda t: t[3]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, PNG_PALETTE_SCHEMA)


def lzw_decode_gif(min_code_size: int, data: bytes) -> bytes:
    """Full GIF-variant LZW decompressor — pure Python, no codec
    library: LSB-first bit packing, variable code width growing at
    dict size 2^width (capped at 12 bits per spec), CLEAR resets,
    EOI terminates, and the KwKwK self-referential case
    (``code == next_code``) handled. This is the general decoder; the
    oracle fixtures use the byte-aligned "uncompressed GIF" encoding
    (CLEAR + literal codes at min_code_size=7), which is just one
    easy region of the same code space."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise ValueError("LZW stream truncated before EOI")
        v = 0
        for k in range(width):
            p = bitpos + k
            v |= ((data[p >> 3] >> (p & 7)) & 1) << k
        bitpos += width
        return v

    while True:
        code = read_code()
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]  # first code after CLEAR: no dict add
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt LZW stream: code {code}")
            if next_code < 4096:  # table full at 12 bits: stop inserting
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev = entry


GIF_PIXEL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_px", LongType()),
        StructField("r_sum", LongType()),
        StructField("g_sum", LongType()),
        StructField("b_sum", LongType()),
    ]
)


def gif_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL GIF pixel decode: walk the container (logical screen
    descriptor, global color table, image descriptor, sub-block
    chain), LZW-decompress the pixel indices
    (:func:`lzw_decode_gif`), and map through the global color table
    to per-channel sums. Single-image, non-interlaced, global-table
    GIFs (the sprite/icon corpus shape); anything else raises on the
    typed path. With PNG's zlib path this leaves JPEG/MP4 — formats
    whose codecs genuinely need external libraries — as the only
    stubbed decodes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def stats(payload: bytes):
            if len(payload) < 13 or payload[:3] != b"GIF" or payload[
                3:6
            ] not in (b"87a", b"89a"):
                raise ValueError("payload is not a GIF")
            width = int.from_bytes(payload[6:8], "little")
            height = int.from_bytes(payload[8:10], "little")
            packed = payload[10]
            if not packed & 0x80:
                raise ValueError("GIF without a global color table")
            gct_n = 2 << (packed & 0x07)
            pos = 13
            gct = np.frombuffer(
                payload[pos : pos + 3 * gct_n], dtype=np.uint8
            ).reshape(-1, 3)
            pos += 3 * gct_n
            # skip extension blocks to the first image descriptor
            # (bounds-checked: a truncated extension chain fails as a
            # typed ValueError, not an IndexError out of the kernel)
            while pos < len(payload) and payload[pos] == 0x21:
                pos += 2
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension chain")
                pos += 1
            if pos >= len(payload) or payload[pos] != 0x2C:
                raise ValueError("no image descriptor")
            if pos + 10 >= len(payload):
                raise ValueError("truncated GIF image descriptor")
            if payload[pos + 9] & 0xC0:
                raise ValueError("interlaced or local-table GIF")
            pos += 10
            min_code_size = payload[pos]
            pos += 1
            data = b""
            while pos < len(payload) and payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            idx = np.frombuffer(
                lzw_decode_gif(min_code_size, data), dtype=np.uint8
            )
            if idx.size != width * height:
                raise ValueError(
                    f"decoded {idx.size} pixels, expected {width * height}"
                )
            if int(idx.max(initial=0)) >= gct_n:
                raise ValueError("palette index out of range")
            rgb = gct[idx].astype(np.int64)
            return (
                idx.size,
                int(rgb[:, 0].sum()),
                int(rgb[:, 1].sum()),
                int(rgb[:, 2].sum()),
            )

        for pdf in it:
            d = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_px": d.map(lambda t: t[0]).astype("int64"),
                    "r_sum": d.map(lambda t: t[1]).astype("int64"),
                    "g_sum": d.map(lambda t: t[2]).astype("int64"),
                    "b_sum": d.map(lambda t: t[3]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, GIF_PIXEL_SCHEMA)


DECIMATE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_out", LongType()),
        StructField("out_sum", LongType()),
        StructField("out_peak", LongType()),
    ]
)


def wav_decimate_stats(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio downsampling: boxcar-decimate each WAV's int16 PCM
    stream by ``factor`` (mean of each consecutive frame, floored —
    the anti-aliased cheap resample an ASR ingest pipeline runs to
    normalize sample rates) and report stats of the DOWNSAMPLED
    signal: count, sum, peak |x|. Integer-exact by construction
    (``floor`` toward −inf on an exact small-int mean), so a fixture
    corpus with formula samples is fully oracle-replayable. A
    trailing partial frame is dropped (``n_out = n // factor``).
    Raises on non-16-bit PCM."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def stats(payload: bytes):
            wav = parse_wav_header(payload)
            if wav is None or wav[2] != 16:
                raise ValueError("payload is not a 16-bit PCM WAV")
            pos = 12
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                if cid == b"data":
                    raw = payload[pos + 8 : pos + 8 + csize]
                    x = np.frombuffer(
                        raw, dtype="<i2", count=len(raw) // 2
                    ).astype(np.int64)
                    n_out = len(x) // factor
                    frames = x[: n_out * factor].reshape(n_out, factor)
                    out = np.floor(frames.sum(axis=1) / float(factor)).astype(
                        np.int64
                    )
                    return (
                        n_out,
                        int(out.sum()),
                        int(np.abs(out).max()) if n_out else 0,
                    )
                pos += 8 + csize + (csize & 1)
            raise ValueError("no data chunk")

        for pdf in it:
            d = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_out": d.map(lambda t: t[0]).astype("int64"),
                    "out_sum": d.map(lambda t: t[1]).astype("int64"),
                    "out_peak": d.map(lambda t: t[2]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, DECIMATE_SCHEMA)


FREQ_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("dom_bin", IntegerType()),
    ]
)


def wav_dominant_freq(media: DataFrame) -> DataFrame:
    """REAL spectral analysis: dominant frequency bin of each WAV's
    PCM samples via NumPy's real FFT inside the Arrow kernel — the
    tone/voicing profile pass an audio corpus runs for silence/
    tone-artifact filtering. ``dom_bin = argmax_{1 ≤ b ≤ n/2} |X_b|``
    (DC excluded: quantization offsets would otherwise win on quiet
    clips). Raises on non-16-bit-PCM payloads (typed path).

    The oracle never recomputes an FFT: fixtures are pure generated
    tones, so the dominant bin IS the generating frequency — the
    kernel must recover the parameter from the wire bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def dom(payload: bytes):
            wav = parse_wav_header(payload)
            if wav is None or wav[2] != 16:
                raise ValueError("payload is not a 16-bit PCM WAV")
            pos = 12
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
                if cid == b"data":
                    raw = payload[pos + 8 : pos + 8 + csize]
                    x = np.frombuffer(
                        raw, dtype="<i2", count=len(raw) // 2
                    ).astype(np.float64)
                    if len(x) < 4:
                        raise ValueError("too few samples for a spectrum")
                    mag = np.abs(np.fft.rfft(x))
                    return len(x), int(mag[1:].argmax()) + 1
                pos += 8 + csize + (csize & 1)
            raise ValueError("no data chunk")

        for pdf in it:
            d = pdf["payload"].map(dom)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": d.map(lambda t: t[0]).astype("int64"),
                    "dom_bin": d.map(lambda t: t[1]).astype("int32"),
                }
            )

    return media.mapInPandas(batches, FREQ_SCHEMA)
