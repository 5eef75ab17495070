"""Multimodal column plumbing tests ([EXT] E5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_hadoop_spark.operators.multimodal import (
    attach_media,
    decode_media,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    return attach_media(docs.select("doc_id", "text"),
                        F.encode("text", "utf-8")).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "media_type", "n_bytes", "sha"]
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])
    assert len(row["sha"]) == 64


def test_decode_stub_is_deterministic(media):
    d1 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
          for r in decode_media(media).collect()}
    d2 = {r["media_id"]: (r["width"], r["height"], r["n_frames"])
          for r in decode_media(media).collect()}
    assert d1 == d2
    assert all(64 <= w < 256 and 64 <= h < 256 and 1 <= f <= 16
               for (w, h, f) in d1.values())


def test_decode_strict_raises(media):
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        decode_media(media, strict=True).collect()


def test_frame_sampling(media):
    decoded = decode_media(media)
    frames = frame_sample(decoded, every_n=4)
    per = {r["media_id"]: 0 for r in frames.collect()}
    joined = {r["media_id"]: r["n_frames"] for r in decoded.collect()}
    for r in frames.collect():
        per[r["media_id"]] += 1
    for mid, nf in joined.items():
        assert per[mid] == (nf + 3) // 4


def test_resize_media_fits_target_and_preserves_aspect(spark):
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        decode_media,
        resize_media,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"another-payload")], ["id", "payload"]
    )
    decoded = decode_media(attach_media(docs, F.col("payload")), strict=False)
    for r in resize_media(decoded, 224, 224).collect():
        assert r.out_width <= 224 and r.out_height <= 224
        assert max(r.out_width, r.out_height) == 224  # fit, not shrink-to-nothing
        got = r.out_width / r.out_height
        want = r.width / r.height
        assert abs(got - want) / want < 0.05  # aspect preserved within floor()


def test_extract_features_deterministic_shape(spark):
    from pagerank_hadoop_spark.operators.multimodal import attach_media, extract_features
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"another-payload")], ["id", "payload"]
    )
    media = attach_media(docs, F.col("payload"))
    a = {r.media_id: r.embedding for r in extract_features(media).collect()}
    b = {r.media_id: r.embedding for r in extract_features(media).collect()}
    assert a == b  # digest-derived: deterministic across runs
    assert all(len(v) == 16 for v in a.values())
    assert a[1] != a[2]


def _bmp(width, height, bpp=24, top_down=False):
    import struct

    row = (width * (bpp // 8) + 3) // 4 * 4
    img = row * abs(height)
    h = -abs(height) if top_down else height
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + img, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, h, 1, bpp, 0, img, 0, 0, 0, 0)
        + b"\x00" * img
    )


def _wav(channels, rate, bits, n_samples, extra_chunk_first=False):
    import struct

    data = b"\x00" * (n_samples * channels * bits // 8)
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    # an odd-sized LIST chunk before fmt exercises chunk walking +
    # word alignment
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks = (lst + fmt) if extra_chunk_first else fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_bmp_header():
    from pagerank_hadoop_spark.operators.multimodal import parse_bmp_header

    # positive height = bottom-up file rows (top_down flag False)
    assert parse_bmp_header(_bmp(7, 3)) == (7, 3, 24, False)
    # top-down BMP stores negative height; magnitude + sign come back
    assert parse_bmp_header(_bmp(5, 2, top_down=True)) == (5, 2, 24, True)
    assert parse_bmp_header(b"BM" + b"\x00" * 10) is None  # truncated
    assert parse_bmp_header(b"PNG" + b"\x00" * 60) is None  # wrong magic
    assert parse_bmp_header(_wav(1, 8000, 16, 10)) is None


def test_parse_wav_header():
    from pagerank_hadoop_spark.operators.multimodal import parse_wav_header

    assert parse_wav_header(_wav(2, 16000, 16, 100)) == (2, 16000, 16, 100)
    # fmt not the first chunk + odd-size chunk word alignment
    assert parse_wav_header(
        _wav(1, 8000, 16, 25, extra_chunk_first=True)
    ) == (1, 8000, 16, 25)
    assert parse_wav_header(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert parse_wav_header(_bmp(4, 4)) is None


def test_parse_wav_header_rejects_subbyte_frames_and_clamps_truncation():
    """ADVICE r3: bits=4 made channels*bits//8 == 0 → ZeroDivisionError;
    a truncated data chunk declared more samples than the payload held.
    Both must degrade to None / clamped counts, never crash."""
    from pagerank_hadoop_spark.operators.multimodal import parse_wav_header

    # bits=4, channels=1 → frame size would be 0: not plausible PCM
    assert parse_wav_header(_wav(1, 8000, 4, 10)) is None
    # bits not a byte multiple (12) is equally unaddressable
    assert parse_wav_header(_wav(1, 8000, 12, 10)) is None

    # truncated data chunk: header declares 100 samples, payload holds 40
    full = _wav(1, 8000, 16, 100)
    cut = full[: len(full) - 120]  # drop 60 samples' worth of bytes
    got = parse_wav_header(cut)
    assert got is not None and got[3] == 40

    # multi-data-chunk: the FIRST data chunk wins (consistent with
    # wav_sample_stats' decode), not the last
    import struct

    extra = b"data" + struct.pack("<I", 4) + b"\x00" * 4
    assert parse_wav_header(_wav(1, 8000, 16, 25) + extra)[3] == 25


def test_decode_media_real_bmp_and_strict(spark):
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        decode_media,
    )
    from pyspark.sql import functions as F

    rows = [(1, _bmp(9, 4)), (2, _wav(2, 16000, 16, 32))]
    media = attach_media(
        spark.createDataFrame(rows, ["id", "payload"]), F.col("payload")
    )
    out = {r.media_id: r for r in decode_media(media, strict=True).collect()}
    assert (out[1].width, out[1].height, out[1].n_frames) == (9, 4, 1)
    # WAV maps to (rate, channels, samples)
    assert (out[2].width, out[2].height, out[2].n_frames) == (16000, 2, 32)

    import pytest
    from py4j.protocol import Py4JJavaError

    bad = attach_media(
        spark.createDataFrame([(3, b"not-a-media-file")], ["id", "payload"]),
        F.col("payload"),
    )
    with pytest.raises(Exception) as ei:
        decode_media(bad, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, Py4JJavaError
    )


def test_decode_wav_duration(spark):
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        decode_wav,
    )
    from pyspark.sql import functions as F

    media = attach_media(
        spark.createDataFrame([(1, _wav(1, 8000, 16, 12000))], ["id", "payload"]),
        F.col("payload"),
    )
    r = decode_wav(media).collect()[0]
    assert (r.channels, r.sample_rate, r.bits, r.n_samples) == (1, 8000, 16, 12000)
    assert r.duration_ms == 1500


def test_bmp_pixel_stats_known_raster(spark):
    import struct

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        bmp_pixel_stats,
    )
    from pyspark.sql import functions as F

    # 2x2, 24bpp: stride = 8 (2 px * 3 B + 2 pad). Pixels (BGR):
    # row0: (1,2,3) (4,5,6); row1: (7,8,9) (10,11,12); pad bytes 0xFF
    # must be EXCLUDED from the sums
    raster = bytes([1, 2, 3, 4, 5, 6, 255, 255, 7, 8, 9, 10, 11, 12, 255, 255])
    payload = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
        + raster
    )
    media = attach_media(
        spark.createDataFrame([(1, payload)], ["id", "payload"]), F.col("payload")
    )
    r = bmp_pixel_stats(media).collect()[0]
    assert (r.n_px, r.b_sum, r.g_sum, r.r_sum) == (4, 1 + 4 + 7 + 10, 2 + 5 + 8 + 11, 3 + 6 + 9 + 12)


def test_wav_sample_stats_known_samples(spark):
    import struct

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        wav_sample_stats,
    )
    from pyspark.sql import functions as F

    xs = [0, 1000, -1000, 32767, -32768]
    data = struct.pack("<5h", *xs)
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    media = attach_media(
        spark.createDataFrame([(1, payload)], ["id", "payload"]), F.col("payload")
    )
    r = wav_sample_stats(media).collect()[0]
    assert r.n_samples == 5
    assert r.energy == sum(x * x for x in xs)
    assert r.peak == 32768


def _gif(w, h, n_frames, with_gct=False, with_ext=False):
    import struct

    out = b"GIF89a" + struct.pack("<HH", w, h)
    if with_gct:
        out += bytes([0x80 | 0x01, 0, 0]) + b"\x00" * (3 * 4)  # 4-entry GCT
    else:
        out += b"\x00\x00\x00"
    for _ in range(n_frames):
        if with_ext:  # graphics-control extension before each frame
            out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += (
            b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + b"\x02" + b"\x02\xaa\xbb" + b"\x00"  # 2-byte sub-block
        )
    return out + b"\x3b"


def test_parse_gif_meta():
    from pagerank_hadoop_spark.operators.multimodal import parse_gif_meta

    assert parse_gif_meta(_gif(12, 7, 1)) == (12, 7, 1)
    assert parse_gif_meta(_gif(5, 5, 6)) == (5, 5, 6)
    # global color table and extension blocks are walked, not counted
    assert parse_gif_meta(_gif(9, 4, 3, with_gct=True, with_ext=True)) == (9, 4, 3)
    assert parse_gif_meta(b"GIF89a\x00") is None  # truncated
    assert parse_gif_meta(b"NOTAGIF" + b"\x00" * 20) is None
    assert parse_gif_meta(_gif(3, 3, 0)) is None  # no frames


def _bmp_with_raster(width, height, raster: bytes):
    import struct

    row = (width * 3 + 3) // 4 * 4
    assert row == width * 3, "test rasters avoid padding"
    img = row * height
    assert len(raster) == img
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + img, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img, 0, 0, 0, 0
        )
        + raster
    )


def test_bmp_ahash_identical_and_contrast(spark):
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        bmp_ahash,
    )

    # left half dark, right half bright: expect exactly 32 set bits
    raster = bytearray()
    for _y in range(8):
        for x in range(8):
            raster += bytes([0, 0, 0] if x < 4 else [200, 200, 200])
    payload = _bmp_with_raster(8, 8, bytes(raster))
    df = spark.createDataFrame(
        [(1, payload), (2, payload)], "p_partkey long, payload binary"
    )
    out = bmp_ahash(
        attach_media(df, F.col("payload"), media_type="image/bmp")
    ).collect()
    hashes = {r.media_id: r.ahash for r in out}
    assert hashes[1] == hashes[2]
    assert bin(hashes[1] % (1 << 64)).count("1") == 32


def test_bmp_ahash_rejects_non_multiple_of_8(spark):
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        bmp_ahash,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, _bmp(9, 8))], "p_partkey long, payload binary"
    )
    with _pytest.raises(Exception, match="multiples of 8"):
        bmp_ahash(
            attach_media(df, F.col("payload"), media_type="image/bmp")
        ).collect()


def test_parse_png_meta():
    import struct

    from pagerank_hadoop_spark.operators.multimodal import parse_png_meta

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = (
        struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 640, 480)
        + bytes([8, 6, 0, 0, 0])
        + b"\x00" * 4
    )
    iend = struct.pack(">I", 0) + b"IEND" + b"\x00" * 4
    assert parse_png_meta(sig + ihdr + iend) == (640, 480, 8, 6)
    assert parse_png_meta(b"JFIF" + b"\x00" * 60) is None
    assert parse_png_meta(sig + b"\x00" * 10) is None  # truncated IHDR
    assert parse_png_meta(_bmp(4, 4)) is None


def _png_gray8(px, split_idat=False, compress=True):
    """Build a real greyscale-8 PNG from an (h, w) int array: scanline
    filter type y % 5, genuinely zlib-compressed IDAT (or stored-block
    when compress=False), optionally split across two IDAT chunks."""
    import struct
    import zlib

    from pagerank_hadoop_spark.operators.multimodal import _paeth

    h, w = len(px), len(px[0])
    lines = b""
    for y in range(h):
        f = y % 5
        row = bytearray([f])
        for x in range(w):
            a = int(px[y][x - 1]) if x > 0 else 0
            b = int(px[y - 1][x]) if y > 0 else 0
            c = int(px[y - 1][x - 1]) if x > 0 and y > 0 else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: _paeth(a, b, c)}[f]
            row.append((int(px[y][x]) - pred) % 256)
        lines += bytes(row)
    if compress:
        stream = zlib.compress(lines, 6)
    else:
        stream = (
            b"\x78\x01\x01"
            + struct.pack("<HH", len(lines), 0xFFFF - len(lines))
            + lines
            + struct.pack(">I", zlib.adler32(lines))
        )

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    ihdr = struct.pack(">II", w, h) + bytes([8, 0, 0, 0, 0])
    body = chunk(b"IHDR", ihdr)
    if split_idat:
        body += chunk(b"IDAT", stream[:2]) + chunk(b"IDAT", stream[2:])
    else:
        body += chunk(b"IDAT", stream)
    return b"\x89PNG\r\n\x1a\n" + body + chunk(b"IEND", b"")


def test_png_pixel_stats_real_zlib_roundtrip(spark):
    """png_pixel_stats must invert a GENUINELY compressed IDAT (dynamic
    Huffman, not just the fixture's stored blocks), reverse all five
    filters, and concatenate split IDAT chunks."""
    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        png_pixel_stats,
    )

    rng = np.random.default_rng(17)
    imgs = {
        1: rng.integers(0, 256, size=(9, 7)),   # ≥5 rows: all filters hit
        2: rng.integers(0, 256, size=(6, 11)),
        3: rng.integers(0, 256, size=(5, 4)),
    }
    rows = [
        (i, bytearray(_png_gray8(px, split_idat=(i == 2), compress=(i != 3))))
        for i, px in imgs.items()
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = attach_media(df, F.col("payload"), media_type="image/png")
    got = {r.media_id: r for r in png_pixel_stats(media).collect()}
    for i, px in imgs.items():
        assert got[i].n_px == px.size
        assert got[i].px_sum == int(px.sum())
        assert got[i].px_min == int(px.min())
        assert got[i].px_max == int(px.max())


def test_png_pixel_stats_rejects_unsupported(spark):
    import struct

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        png_pixel_stats,
    )

    # RGBA color type: typed path refuses rather than mis-decoding
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = (
        struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 4, 4)
        + bytes([8, 6, 0, 0, 0]) + b"\x00" * 4
    )
    df = spark.createDataFrame(
        [(1, bytearray(sig + ihdr))], "media_id long, payload binary"
    )
    media = attach_media(df, F.col("payload"), media_type="image/png")
    with pytest.raises(Exception, match="greyscale-8"):
        png_pixel_stats(media).collect()


def test_png_palette_stats_real_zlib_and_validation(spark):
    """Palette path: genuinely compressed indices map through PLTE to
    exact channel sums; an out-of-range index or missing PLTE raises."""
    import struct
    import zlib

    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        png_palette_stats,
    )

    rng = np.random.default_rng(23)
    h, w, k = 7, 6, 5
    pal = rng.integers(0, 256, size=(k, 3)).astype(np.uint8)
    idx = rng.integers(0, k, size=(h, w))

    png = _png_gray8(idx)  # greyscale builder: filtered y%5, zlib'd
    # rewrite IHDR color type 0 -> 3 and splice a PLTE chunk after IHDR
    body = bytearray(png)
    body[25] = 3  # color_type byte in IHDR
    plte = struct.pack(">I", 3 * k) + b"PLTE" + pal.tobytes() + b"\x00" * 4
    ihdr_end = 8 + 8 + 13 + 4
    good = bytes(body[:ihdr_end]) + plte + bytes(body[ihdr_end:])

    df = spark.createDataFrame(
        [(1, bytearray(good))], "media_id long, payload binary"
    )
    media = attach_media(df, F.col("payload"), media_type="image/png")
    r = png_palette_stats(media).collect()[0]
    rgb = pal[idx.ravel()].astype(np.int64)
    assert (r.n_px, r.r_sum, r.g_sum, r.b_sum) == (
        idx.size, int(rgb[:, 0].sum()), int(rgb[:, 1].sum()),
        int(rgb[:, 2].sum()),
    )

    # palette too short for the indices present -> loud failure
    short_plte = struct.pack(">I", 3 * 2) + b"PLTE" + pal[:2].tobytes() + b"\x00" * 4
    bad = bytes(body[:ihdr_end]) + short_plte + bytes(body[ihdr_end:])
    df2 = spark.createDataFrame(
        [(1, bytearray(bad))], "media_id long, payload binary"
    )
    media2 = attach_media(df2, F.col("payload"), media_type="image/png")
    with pytest.raises(Exception, match="out of range"):
        png_palette_stats(media2).collect()


def test_wav_dominant_freq_recovers_tone(spark):
    """FFT kernel recovers the generating frequency from wire bytes,
    including with additive low-level noise; non-16-bit input raises."""
    import struct

    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        wav_dominant_freq,
    )

    def tone_wav(k, n=256, noise=0.0, seed=1):
        rng = np.random.default_rng(seed)
        i = np.arange(n)
        x = 12000 * np.sin(2 * np.pi * k * i / n) + noise * rng.normal(size=n)
        data = x.astype("<i2").tobytes()
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        chunks = fmt + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    rows = [(7, bytearray(tone_wav(7))), (31, bytearray(tone_wav(31, noise=500.0)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: (r.n_samples, r.dom_bin)
        for r in wav_dominant_freq(
            attach_media(df, F.col("payload"), "audio/wav")
        ).collect()
    }
    assert got == {7: (256, 7), 31: (256, 31)}

    bad = spark.createDataFrame(
        [(1, bytearray(_wav(1, 8000, 8, 64)))], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="16-bit"):
        wav_dominant_freq(
            attach_media(bad, F.col("payload"), "audio/wav")
        ).collect()


def _lzw_encode(min_code_size, data: bytes) -> bytes:
    """Independent GIF-LZW encoder (variable width, dict growth) for
    gating the decoder's general path."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = []

    def emit(code, width):
        for k in range(width):
            bits.append((code >> k) & 1)

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        w = bytes([ch])
    emit(table[w], width)
    emit(eoi, width)
    by = bytearray()
    for i, b in enumerate(bits):
        if i % 8 == 0:
            by.append(0)
        by[-1] |= b << (i % 8)
    return bytes(by)


def _gif_lzw(idx, pal, compressed=True, mcs=7):
    import struct

    h, w = idx.shape
    k = len(pal)
    size_field = max(1, (k - 1).bit_length() - 1)  # 2^(n+1) >= k
    gct = bytearray()
    for r, g, b in pal:
        gct += bytes([r, g, b])
    gct += b"\x00" * (3 * ((2 << size_field) - k))
    data = bytes(idx.ravel().tolist())
    if compressed:
        stream = _lzw_encode(mcs, data)
    else:
        stream = b"\x80" + data + b"\x81"
    blocks = b""
    for i in range(0, len(stream), 200):
        chunk = stream[i : i + 200]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0x80 | 0x70 | size_field, 0, 0])
        + bytes(gct)
        + b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        + bytes([mcs]) + blocks + b"\x00\x3B"
    )


def test_gif_pixel_stats_real_lzw(spark):
    """The general LZW path: genuinely compressed streams (dict
    growth across width bumps, multi-sub-block) decode to the exact
    palette-mapped channel sums; the byte-aligned form agrees."""
    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        gif_pixel_stats,
    )

    rng = np.random.default_rng(29)
    pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(128)]
    imgs = {
        1: rng.integers(0, 128, size=(20, 30)),   # 600 px: width bumps
        2: np.tile(rng.integers(0, 128, size=(1, 8)), (6, 1)),  # runs: KwKwK
        3: rng.integers(0, 128, size=(5, 7)),
    }
    rows = [
        (i, bytearray(_gif_lzw(px.astype(np.uint8), pal, compressed=(i != 3))))
        for i, px in imgs.items()
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: r
        for r in gif_pixel_stats(
            attach_media(df, F.col("payload"), "image/gif")
        ).collect()
    }
    parr = np.array(pal, dtype=np.int64)
    for i, px in imgs.items():
        rgb = parr[px.ravel()]
        assert got[i].n_px == px.size
        assert (got[i].r_sum, got[i].g_sum, got[i].b_sum) == (
            int(rgb[:, 0].sum()), int(rgb[:, 1].sum()), int(rgb[:, 2].sum()),
        )


def test_wav_decimate_known_samples(spark):
    """2:1 boxcar decimation: floor-toward(-inf) means (negative odd
    sums included), odd trailing sample dropped."""
    import struct

    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        wav_decimate_stats,
    )

    x = np.array([10, 11, -3, -4, 5, -6, 99], dtype="<i2")  # 7 samples
    data = x.tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    chunks = fmt + b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    df = spark.createDataFrame([(1, bytearray(wav))], "media_id long, payload binary")
    r = wav_decimate_stats(
        attach_media(df, F.col("payload"), "audio/wav"), factor=2
    ).collect()[0]
    # frames: (10,11)->10, (-3,-4)->-4 (floor!), (5,-6)->-1; 99 dropped
    assert (r.n_out, r.out_sum, r.out_peak) == (3, 5, 10)


def test_png_rgb_stats_real_zlib_and_bpp3_filters(spark):
    """Truecolor path: genuinely compressed RGB scanlines filtered
    with the spec's bpp=3 left distance must unfilter to the exact
    channel sums — a bpp-naive (left = previous byte) decoder fails
    every Sub/Average/Paeth row here."""
    import struct
    import zlib

    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        _paeth,
        attach_media,
        png_rgb_stats,
    )

    rng = np.random.default_rng(31)
    h, w = 9, 6
    px = rng.integers(0, 256, size=(h, w, 3)).astype(np.int64)
    row_bytes = w * 3
    flat = px.reshape(h, row_bytes)
    lines = b""
    for y in range(h):
        f = y % 5
        row = bytearray([f])
        for x in range(row_bytes):
            a = int(flat[y][x - 3]) if x >= 3 else 0
            b = int(flat[y - 1][x]) if y > 0 else 0
            c = int(flat[y - 1][x - 3]) if (x >= 3 and y > 0) else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: _paeth(a, b, c)}[f]
            row.append((int(flat[y][x]) - pred) % 256)
        lines += bytes(row)

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines, 6))
        + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, payload binary")
    r = png_rgb_stats(
        attach_media(df, F.col("payload"), "image/png")
    ).collect()[0]
    assert (r.n_px, r.r_sum, r.g_sum, r.b_sum) == (
        w * h,
        int(px[:, :, 0].sum()),
        int(px[:, :, 1].sum()),
        int(px[:, :, 2].sum()),
    )


def test_png_adam7_interlaced_decode(spark):
    """Adam7: seven independently-filtered sub-images scattered on
    the spec grids. Build a genuinely interlaced + compressed grey
    PNG (filter type r % 5 per pass scanline) and an RGB one; the
    kernels must deinterlace to the exact stats of the source
    raster."""
    import struct
    import zlib

    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        _ADAM7,
        _paeth,
        attach_media,
        png_pixel_stats,
        png_rgb_stats,
    )

    def filt(flat, bpp):
        # flat: (rows, cols*bpp) int array -> filtered scanline bytes
        h = len(flat)
        out = b""
        for y in range(h):
            f = y % 5
            row = bytearray([f])
            for x in range(len(flat[y])):
                a = int(flat[y][x - bpp]) if x >= bpp else 0
                b = int(flat[y - 1][x]) if y > 0 else 0
                c = int(flat[y - 1][x - bpp]) if (x >= bpp and y > 0) else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2,
                        4: _paeth(a, b, c)}[f]
                row.append((int(flat[y][x]) - pred) % 256)
            out += bytes(row)
        return out

    def interlaced_png(px, color_type, bpp):
        h, w = px.shape[0], px.shape[1]
        stream = b""
        for x0, dx, y0, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            stream += filt(sub.reshape(sub.shape[0], -1), bpp)

        def chunk(ctype, data):
            return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

        ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 1])
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(stream, 6)) + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(37)
    grey = rng.integers(0, 256, size=(11, 13)).astype(np.int64)
    gdf = spark.createDataFrame(
        [(1, bytearray(interlaced_png(grey, 0, 1)))],
        "media_id long, payload binary",
    )
    r = png_pixel_stats(
        attach_media(gdf, F.col("payload"), "image/png")
    ).collect()[0]
    assert (r.n_px, r.px_sum, r.px_min, r.px_max) == (
        grey.size, int(grey.sum()), int(grey.min()), int(grey.max()),
    )

    rgb = rng.integers(0, 256, size=(10, 7, 3)).astype(np.int64)
    cdf = spark.createDataFrame(
        [(1, bytearray(interlaced_png(rgb, 2, 3)))],
        "media_id long, payload binary",
    )
    r2 = png_rgb_stats(
        attach_media(cdf, F.col("payload"), "image/png")
    ).collect()[0]
    assert (r2.n_px, r2.r_sum, r2.g_sum, r2.b_sum) == (
        70, int(rgb[:, :, 0].sum()), int(rgb[:, :, 1].sum()),
        int(rgb[:, :, 2].sum()),
    )


# ---------------------------------------------------------------------------
# baseline JPEG codec (round 5)
# ---------------------------------------------------------------------------

def test_jpeg_block_constant_roundtrip_exact():
    """DC-only blocks (constant 8x8) survive the lossy pipeline
    bit-exactly with all-ones quant tables — the property the in-query
    oracle fixtures rely on."""
    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    px = np.zeros((16, 24), dtype=np.uint8)
    for by in range(2):
        for bx in range(3):
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                bx * 7 + by * 13 + 5
            ) % 256
    w, h, planes = jpeg_decode(jpeg_encode([px]))
    assert (w, h) == (24, 16)
    assert (planes[0] == px).all()


def test_jpeg_420_color_roundtrip_exact():
    """4:2:0: interleaved MCU order, per-component DC predictors, and
    chroma replication all reproduce component planes exactly when Y
    is block-constant and chroma MCU-constant."""
    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    w, h = 32, 16
    y = np.zeros((h, w), dtype=np.uint8)
    for by in range(2):
        for bx in range(4):
            y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (bx * 7 + by * 13 + 9) % 256
    cb = np.zeros((8, 16), dtype=np.uint8)
    cr = np.zeros((8, 16), dtype=np.uint8)
    for mx in range(2):
        cb[:, mx * 8 : mx * 8 + 8] = (mx * 11 + 9) % 256
        cr[:, mx * 8 : mx * 8 + 8] = (mx * 5 + 18) % 256
    data = jpeg_encode([y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)])
    W, H, planes = jpeg_decode(data)
    assert (W, H) == (w, h)
    assert (planes[0] == y).all()
    assert (planes[1] == np.repeat(np.repeat(cb, 2, 0), 2, 1)).all()
    assert (planes[2] == np.repeat(np.repeat(cr, 2, 0), 2, 1)).all()


def test_jpeg_ac_runlength_path_vs_coefficient_replay():
    """Arbitrary pixels exercise the full AC path (runs, ZRL, EOB,
    magnitude extend). The decoder must reproduce EXACTLY the IDCT of
    the quantized coefficients the independent encoder emitted — an
    in-test IDCT (explicit double-loop formula, not the decoder's
    matrix) replays the expectation."""
    import math

    import numpy as np

    from pagerank_hadoop_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.int64).astype(np.uint8)
    data = jpeg_encode([px])
    coeffs = jpeg_encode.last_coefficients

    def idct_ref(blk):
        out = np.zeros((8, 8))
        for yy in range(8):
            for xx in range(8):
                s = 0.0
                for v in range(8):
                    for u in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv / 4.0 * blk[v][u]
                            * math.cos((2 * xx + 1) * u * math.pi / 16)
                            * math.cos((2 * yy + 1) * v * math.pi / 16)
                        )
                out[yy, xx] = s
        return out

    expected = np.zeros((16, 16))
    i = 0
    for my in range(2):
        for mx in range(2):
            blk = idct_ref(coeffs[i].astype(np.float64)) + 128.0
            expected[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.clip(
                np.floor(blk + 0.5), 0, 255
            )
            i += 1
    _, _, planes = jpeg_decode(data)
    assert (planes[0] == expected.astype(np.uint8)).all()
    # lossy sanity: quant-1 error is tiny on real pixels
    assert np.abs(planes[0].astype(int) - px.astype(int)).max() <= 2


def test_jpeg_typed_errors():
    """Out-of-profile inputs raise typed ValueErrors, never garbage
    pixels or IndexErrors: not-a-JPEG, truncated entropy stream,
    progressive SOF2, restart intervals, 16-bit quant tables."""
    import numpy as np
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    with _pytest.raises(ValueError, match="not a JPEG"):
        jpeg_decode(b"\x00\x01\x02\x03")

    px = np.full((8, 8), 77, dtype=np.uint8)
    good = jpeg_encode([px])
    with _pytest.raises(ValueError, match="truncated|entropy"):
        jpeg_decode(good[:-4])  # chop entropy + EOI

    def patch_marker(data, old, new):
        i = data.index(bytes([0xFF, old]))
        return data[:i] + bytes([0xFF, new]) + data[i + 2 :]

    with _pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode(patch_marker(good, 0xC0, 0xC2))  # progressive

    # inject a DRI segment after DQT
    i = good.index(bytes([0xFF, 0xC0]))
    dri = bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x08])
    with _pytest.raises(ValueError, match="restart"):
        jpeg_decode(good[:i] + dri + good[i:])

    # flip DQT precision nibble to 16-bit
    j = good.index(bytes([0xFF, 0xDB]))
    bad = bytearray(good)
    bad[j + 4] = 0x10
    with _pytest.raises(ValueError, match="16-bit"):
        jpeg_decode(bytes(bad))


def test_mp4_container_parse_edges():
    """ISO-BMFF walker: version-0/1 mvhd+tkhd offsets, first-nonzero
    track dims, largesize (size=1) and to-end (size=0) boxes, typed
    raises on overruns and zero timescale, None for non-MP4."""
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.multimodal import parse_mp4_meta

    def box(t, body):
        return (len(body) + 8).to_bytes(4, "big") + t + body

    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isom")
    mvhd = box(
        b"mvhd", bytes(12) + (1000).to_bytes(4, "big")
        + (45000).to_bytes(4, "big") + bytes(80)
    )

    def tkhd_v0(w, h):
        return box(
            b"tkhd",
            bytes(4) + bytes(20) + bytes(8) + bytes(8) + bytes(36)
            + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
        )

    def tkhd_v1(w, h):
        return box(
            b"tkhd",
            bytes([1, 0, 0, 0]) + bytes(32) + bytes(8) + bytes(8) + bytes(36)
            + (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big"),
        )

    moov = box(
        b"moov",
        mvhd + box(b"trak", tkhd_v0(0, 0)) + box(b"trak", tkhd_v1(1920, 1080)),
    )
    # zero-dim audio track first: dims come from the SECOND (v1) trak
    assert parse_mp4_meta(ftyp + moov) == (45000, 1000, 2, 1920, 1080)

    # mvhd version 1 (64-bit times/duration)
    mvhd1 = box(
        b"mvhd", bytes([1, 0, 0, 0]) + bytes(16) + (600).to_bytes(4, "big")
        + (90000).to_bytes(8, "big") + bytes(80)
    )
    got = parse_mp4_meta(ftyp + box(b"moov", mvhd1 + box(b"trak", tkhd_v0(320, 240))))
    assert got == (150000, 600, 1, 320, 240)

    # largesize box (size=1 + 64-bit length) around moov
    body = mvhd + box(b"trak", tkhd_v0(64, 48))
    large = (1).to_bytes(4, "big") + b"moov" + (len(body) + 16).to_bytes(8, "big") + body
    assert parse_mp4_meta(ftyp + large) == (45000, 1000, 1, 64, 48)

    # size=0: moov extends to end of file
    toend = (0).to_bytes(4, "big") + b"moov" + body
    assert parse_mp4_meta(ftyp + toend) == (45000, 1000, 1, 64, 48)

    assert parse_mp4_meta(b"0123456789abcdef") is None

    with _pytest.raises(ValueError, match="overruns"):
        parse_mp4_meta(ftyp + box(b"moov", mvhd)[:-4])
    bad_ts = box(b"mvhd", bytes(12) + bytes(4) + (5).to_bytes(4, "big") + bytes(80))
    with _pytest.raises(ValueError, match="timescale"):
        parse_mp4_meta(ftyp + box(b"moov", bad_ts))


def test_jpeg_corrupt_headers_raise_typed():
    """Review findings: short DQT/DHT bodies and non-interleaved
    multi-scan layouts raise typed ValueErrors, not KeyError/IndexError
    from inside the decode loop."""
    import numpy as np
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.multimodal import (
        jpeg_decode,
        jpeg_encode,
    )

    px = np.full((8, 8), 50, dtype=np.uint8)
    good = jpeg_encode([px])

    # truncate the DQT body (declared length shrunk below 65+2)
    i = good.index(bytes([0xFF, 0xDB]))
    bad = bytearray(good[: i + 2])
    bad += (10).to_bytes(2, "big") + good[i + 4 : i + 4 + 8]
    bad += good[i + 4 + 65 :]
    with _pytest.raises(ValueError, match="truncated DQT"):
        jpeg_decode(bytes(bad))

    # truncate a DHT body mid-BITS
    j = good.index(bytes([0xFF, 0xC4]))
    bad = bytearray(good[: j + 2])
    bad += (12).to_bytes(2, "big") + good[j + 4 : j + 4 + 10]
    bad += good[j + 4 + 10 + 50 :]
    with _pytest.raises(ValueError, match="truncated DHT"):
        jpeg_decode(bytes(bad))

    # 3-component frame with a 1-component scan (non-interleaved)
    w, h = 16, 16
    y = np.full((h, w), 90, dtype=np.uint8)
    cb = np.full((h // 2, w // 2), 128, dtype=np.uint8)
    cr = np.full((h // 2, w // 2), 128, dtype=np.uint8)
    color = jpeg_encode([y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)])
    s = color.index(bytes([0xFF, 0xDA]))
    seglen = int.from_bytes(color[s + 2 : s + 4], "big")
    # rewrite SOS: ns=1, only component 1, same spectral tail
    new_sos = (
        bytes([0xFF, 0xDA]) + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x00, 0, 63, 0])
    )
    patched = color[:s] + new_sos + color[s + 2 + seglen :]
    with _pytest.raises(ValueError, match="non-interleaved"):
        jpeg_decode(patched)


def test_mp4_short_boxes_raise_typed():
    """Review finding: mvhd/tkhd fixed-offset reads must be bounded by
    the declared box, not silently read sibling bytes."""
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.multimodal import parse_mp4_meta

    def box(t, body):
        return (len(body) + 8).to_bytes(4, "big") + t + body

    ftyp = box(b"ftyp", b"isom" + bytes(4) + b"isom")
    # mvhd with only 12 body bytes: timescale/duration lie outside
    short_mvhd = box(b"mvhd", bytes(12))
    with _pytest.raises(ValueError, match="truncated mvhd"):
        parse_mp4_meta(ftyp + box(b"moov", short_mvhd))

    mvhd = box(
        b"mvhd", bytes(12) + (1000).to_bytes(4, "big")
        + (5000).to_bytes(4, "big") + bytes(80)
    )
    # tkhd declaring a 40-byte body: width offset 76 is out of range
    short_tkhd = box(b"tkhd", bytes(40))
    with _pytest.raises(ValueError, match="truncated tkhd"):
        parse_mp4_meta(ftyp + box(b"moov", mvhd + box(b"trak", short_tkhd)))


def test_bmp_cell_ahash_adapter_identity_and_rule_divergence(spark):
    """r13: the cross-modal aHash adapter — (1) a BMP whose
    grayscale equals a decoded video frame's luma produces the
    IDENTICAL hash string as mp4_frame_ahash (the join key works);
    (2) the adapter's exact 64*cell>total rule provably DIVERGES
    from bmp_ahash's floor-mean rule on crafted marginal content, so
    re-hashing (not format conversion) is genuinely required."""
    import numpy as np
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        mp4_frame_ahash,
        mp4_mux_avc,
    )
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        bmp_ahash,
        bmp_cell_ahash,
    )

    def bmp_from_gray(g, top_down=False):
        # spec-correct writer: positive height stores rows bottom-up,
        # negative height top-down (same image either way)
        img = 96 * 32
        hdr = (b"BM" + (54 + img).to_bytes(4, "little") + b"\x00" * 4
               + (54).to_bytes(4, "little"))
        stored_h = -32 if top_down else 32
        ih = ((40).to_bytes(4, "little") + (32).to_bytes(4, "little")
              + stored_h.to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little")
              + (24).to_bytes(2, "little") + b"\x00" * 4
              + img.to_bytes(4, "little") + b"\x00" * 16)
        rows = g if top_down else g[::-1]
        return hdr + ih + np.repeat(
            rows.reshape(-1), 3
        ).astype(np.uint8).tobytes()

    i = np.arange(1024, dtype=np.int64)
    y = ((37 * i * i + 11 * i) % 236 + 10).reshape(32, 32).astype(np.uint8)
    c = np.full((16, 16), 99, np.uint8)
    vids = spark.createDataFrame(
        [(0, bytearray(mp4_mux_avc([h264_encode_ipcm(y, c, c)],
                           dims=(32, 32))))],
        "media_id long, payload binary",
    )
    # the SAME image in both container orientations: the standard
    # bottom-up (positive height — the case the r13 adapter hashed
    # vertically flipped) and top-down (negative height) must both
    # produce the video frame's hash
    bmps = spark.createDataFrame(
        [(0, bytearray(bmp_from_gray(y, top_down=False))),
         (1, bytearray(bmp_from_gray(y, top_down=True)))],
        "media_id long, payload binary",
    )
    vh = mp4_frame_ahash(
        attach_media(vids, F.col("payload"), media_type="video/mp4")
    ).collect()[0]["ahash"]
    brows = bmp_cell_ahash(
        attach_media(bmps, F.col("payload"), media_type="image/bmp")
    ).collect()
    assert len(brows) == 2
    for row in brows:
        assert row["ahash"] == vh and len(vh) == 64

    # rule divergence: a flat-64 image with ONE pixel at 79. The
    # floor-mean rule loses the sub-cell margin (cell_sum 1039 //
    # 16 = 64 == every other mean -> 0 bits), while the exact rule
    # keeps it (64*1039 = 66496 > total 65551 -> 1 bit). Cell-uniform
    # content provably never diverges; this is the minimal
    # non-uniform case.
    g = np.full((32, 32), 64, np.uint8)
    g[0, 0] = 79
    bmps2 = attach_media(
        spark.createDataFrame(
            [(1, bytearray(bmp_from_gray(g)))],
            "media_id long, payload binary",
        ),
        F.col("payload"), media_type="image/bmp",
    )
    cell_bits = bmp_cell_ahash(bmps2).collect()[0]["ahash"].count("1")
    packed = bmp_ahash(bmps2).collect()[0]["ahash"]
    mean_bits = bin(packed & ((1 << 64) - 1)).count("1")
    assert cell_bits != mean_bits


def test_wav_window_fingerprint_crossformat_identity(spark):
    """r13: codec independence — the SAME PCM encoded as FLAC and
    wrapped as WAV produces IDENTICAL fingerprint rows (fp AND
    md5-CSV digest) from the two kernels, including the short-tail
    drop and a stereo channel-0 cut; depth and container errors are
    typed."""
    import numpy as np
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.flac import (
        flac_encode,
        flac_window_fingerprint,
    )
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        wav_window_fingerprint,
    )

    def wav_bytes(x, channels=1, bits=16):
        data = x.astype("<i2").tobytes()
        frame = channels * (bits // 8)
        return (b"RIFF" + (36 + len(data)).to_bytes(4, "little")
                + b"WAVE" + b"fmt " + (16).to_bytes(4, "little")
                + (1).to_bytes(2, "little")
                + channels.to_bytes(2, "little")
                + (8000).to_bytes(4, "little")
                + (8000 * frame).to_bytes(4, "little")
                + frame.to_bytes(2, "little")
                + bits.to_bytes(2, "little")
                + b"data" + len(data).to_bytes(4, "little") + data)

    i = np.arange(512 * 2 + 7, dtype=np.int64)
    mono = (29 * i + 3) % 2000 - 1000
    # stereo: channel 0 = mono, channel 1 = junk the cut must ignore
    stereo = np.stack([mono, (mono * 7) % 500], axis=1)
    flacs = attach_media(
        spark.createDataFrame(
            [
                (0, bytearray(flac_encode(mono[:, None], 8000, 16,
                                          block_size=256))),
                (1, bytearray(flac_encode(stereo, 8000, 16,
                                          block_size=256))),
            ],
            "media_id long, payload binary",
        ),
        F.col("payload"), media_type="audio/flac",
    )
    wavs = attach_media(
        spark.createDataFrame(
            [
                (0, bytearray(wav_bytes(mono))),
                (1, bytearray(wav_bytes(stereo.reshape(-1), channels=2))),
            ],
            "media_id long, payload binary",
        ),
        F.col("payload"), media_type="audio/wav",
    )
    fr = sorted(
        tuple(r) for r in flac_window_fingerprint(flacs).collect()
    )
    wr = sorted(
        tuple(r) for r in wav_window_fingerprint(wavs).collect()
    )
    assert fr == wr and len(fr) == 4  # 2 files x 2 windows, tail dropped

    bad = attach_media(
        spark.createDataFrame(
            [(9, bytearray(b"RIFF\x00\x00\x00\x00JUNK"))],
            "media_id long, payload binary",
        ),
        F.col("payload"), media_type="audio/wav",
    )
    import pytest as _pytest
    with _pytest.raises(Exception, match="not a PCM RIFF/WAVE"):
        wav_window_fingerprint(bad).collect()


def test_mp4_pcm_three_container_fingerprint_identity(spark):
    """r14: the THIRD container — the SAME PCM encoded as FLAC,
    wrapped as WAV, and muxed into an MP4 audio track (all three
    stsd flavors: sowt little-endian, twos big-endian, lpcm v2)
    produces IDENTICAL fingerprint rows (fp AND md5-CSV digest) from
    all three kernels, stereo channel-0 cut included; non-PCM and
    depth errors are typed."""
    import numpy as np
    import pytest as _pytest
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.flac import (
        flac_encode,
        flac_window_fingerprint,
    )
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        mp4_mux_pcm,
        mp4_pcm_window_fingerprint,
        parse_mp4_pcm,
        wav_window_fingerprint,
    )

    def wav_bytes(x, channels=1, bits=16):
        data = x.astype("<i2").tobytes()
        frame = channels * (bits // 8)
        return (b"RIFF" + (36 + len(data)).to_bytes(4, "little")
                + b"WAVE" + b"fmt " + (16).to_bytes(4, "little")
                + (1).to_bytes(2, "little")
                + channels.to_bytes(2, "little")
                + (8000).to_bytes(4, "little")
                + (8000 * frame).to_bytes(4, "little")
                + frame.to_bytes(2, "little")
                + bits.to_bytes(2, "little")
                + b"data" + len(data).to_bytes(4, "little") + data)

    i = np.arange(512 * 2 + 7, dtype=np.int64)
    mono = (29 * i + 3) % 2000 - 1000
    stereo = np.stack([mono, (mono * 7) % 500], axis=1)
    flacs = attach_media(
        spark.createDataFrame(
            [(0, bytearray(flac_encode(mono[:, None], 8000, 16,
                                       block_size=256))),
             (1, bytearray(flac_encode(stereo, 8000, 16,
                                       block_size=256)))],
            "media_id long, payload binary",
        ),
        F.col("payload"), media_type="audio/flac",
    )
    wavs = attach_media(
        spark.createDataFrame(
            [(0, bytearray(wav_bytes(mono))),
             (1, bytearray(wav_bytes(stereo.reshape(-1), channels=2)))],
            "media_id long, payload binary",
        ),
        F.col("payload"), media_type="audio/wav",
    )
    # each stsd flavor must individually reproduce the rows; use
    # sowt for file 0 and lpcm (stereo) for file 1, plus a separate
    # twos == sowt check below
    mp4s = attach_media(
        spark.createDataFrame(
            [(0, bytearray(mp4_mux_pcm(mono[:, None], 8000, "sowt"))),
             (1, bytearray(mp4_mux_pcm(stereo, 8000, "lpcm")))],
            "media_id long, payload binary",
        ),
        F.col("payload"), media_type="audio/mp4",
    )
    fr = sorted(tuple(r) for r in flac_window_fingerprint(flacs).collect())
    wr = sorted(tuple(r) for r in wav_window_fingerprint(wavs).collect())
    mr = sorted(
        tuple(r) for r in mp4_pcm_window_fingerprint(mp4s).collect()
    )
    assert fr == wr == mr and len(mr) == 4

    # twos (big-endian) carries the same samples as sowt
    _, _, _, s_le = parse_mp4_pcm(mp4_mux_pcm(mono[:, None], 8000, "sowt"))
    _, _, _, s_be = parse_mp4_pcm(mp4_mux_pcm(mono[:, None], 8000, "twos"))
    assert (s_le == s_be).all()

    # typed boundaries: a video MP4 has no soun track; junk is None
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        mp4_mux_avc,
    )

    vid = mp4_mux_avc(
        [h264_encode_ipcm(np.full((32, 32), 5, np.uint8),
                          np.full((16, 16), 5, np.uint8),
                          np.full((16, 16), 5, np.uint8))],
        dims=(32, 32),
    )
    with _pytest.raises(ValueError, match="no audio"):
        parse_mp4_pcm(bytes(vid))
    assert parse_mp4_pcm(b"\x00" * 20) is None
    # a foreign file whose stsz sample_size disagrees with
    # channels * bytes-per-sample must refuse typed, not read
    # misaligned samples past the per-chunk bounds check
    good = bytearray(mp4_mux_pcm(mono[:, None], 8000, "sowt"))
    zi = bytes(good).index(b"stsz")
    good[zi + 8 : zi + 12] = (4).to_bytes(4, "big")  # mono 16-bit is 2
    with _pytest.raises(ValueError, match="sample_size"):
        parse_mp4_pcm(bytes(good))


def test_mp4_pcm_multichunk_reassembly():
    """r14: the interleaved multi-chunk layout (stsc run-length
    entries x stco offsets, spacer bytes between chunks standing in
    for the video track) reassembles to the identical PCM as the
    contiguous layout — for every stsd flavor, uneven last chunks
    included; a truncated chunk and a sample-count mismatch are
    typed."""
    import numpy as np
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.multimodal import (
        mp4_mux_pcm,
        parse_mp4_pcm,
    )

    m = np.arange(777, dtype=np.int64) * 13 % 2000 - 1000
    base = parse_mp4_pcm(mp4_mux_pcm(m[:, None], 8000, "sowt"))[3]
    for fmt in ("sowt", "twos", "lpcm"):
        for chunks in (2, 5, 16, 777):
            got = parse_mp4_pcm(
                mp4_mux_pcm(m[:, None], 8000, fmt, chunks=chunks)
            )[3]
            assert (got == base).all(), (fmt, chunks)
    # stereo multi-chunk keeps frame alignment
    st = np.stack([m, (m * 3) % 700], axis=1)
    got = parse_mp4_pcm(mp4_mux_pcm(st, 8000, "twos", chunks=4))[3]
    assert (got == st).all()
    # corrupt: declare one extra sample (parser must notice shortfall)
    p = mp4_mux_pcm(m[:, None], 8000, "sowt", chunks=3)
    idx = p.index(b"stsz")
    n_off = idx + 12  # size(4)+'stsz'... box: [4 size][4 type][4 vf][4 ss][4 n]
    n = int.from_bytes(p[n_off : n_off + 4], "big")
    bad = p[:n_off] + (n + 1).to_bytes(4, "big") + p[n_off + 4 :]
    with _pytest.raises(ValueError, match="chunks hold"):
        parse_mp4_pcm(bad)


def test_lpcm_unsigned_flag_refused():
    """r14 review close: an lpcm v2 entry whose formatSpecificFlags
    lack kAudioFormatFlagIsSignedInteger would silently decode
    unsigned samples as signed — it must refuse typed instead."""
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.multimodal import (
        mp4_mux_pcm,
        parse_mp4_pcm,
    )
    import numpy as np

    p = bytearray(mp4_mux_pcm(np.arange(100)[:, None], 8000, "lpcm"))
    i = bytes(p).index(b"lpcm")
    # formatSpecificFlags ride 56 bytes past the format fourcc
    # (v2 layout); clear the signed bit (keep packed)
    flags_off = i + 56
    assert int.from_bytes(p[flags_off : flags_off + 4], "big") == 0xC
    p[flags_off : flags_off + 4] = (0x8).to_bytes(4, "big")
    with _pytest.raises(NotImplementedError, match="unsigned-integer lpcm"):
        parse_mp4_pcm(bytes(p))
