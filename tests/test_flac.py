"""FLAC constant/verbatim-subset codec (operators.flac).

Round-trip gates run the independent encoder twin against the
decoder; refusal gates pin the typed honest-boundary errors; the
corruption gates prove the CRC/MD5 checks actually fire (both CRCs
are implemented twice — bitwise encoder-side, table decoder-side —
so these tests also cross-validate the two implementations)."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_hadoop_spark.operators.flac import (
    _crc8_bitwise,
    _crc16_bitwise,
    _utf8_like_encode,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
)


def _ramp(n, ch, scale=37, off=0):
    i = np.arange(n * ch).reshape(n, ch)
    return (i * scale + off) % 65536 - 32768


def test_crc_impls_agree():
    for data in (b"", b"\x00", b"123456789", bytes(range(256))):
        assert crc8(data) == _crc8_bitwise(data)
        assert crc16(data) == _crc16_bitwise(data)


def test_crc_check_values():
    # published check values for these generators over b"123456789":
    # CRC-8/ATM (poly 0x07, init 0) = 0xF4; CRC-16/BUYPASS (poly
    # 0x8005, init 0, unreflected) = 0xFEE8
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_roundtrip_mono_verbatim():
    x = _ramp(100, 1)
    d = flac_decode(flac_encode(x, 8000, 16, block_size=32))
    assert d["sample_rate"] == 8000
    assert d["channels"] == 1
    assert d["bits_per_sample"] == 16
    assert d["n_frames"] == 4
    assert (d["samples"] == x).all()


def test_roundtrip_constant_blocks_and_partial_tail():
    x = np.full((70, 2), -1234, dtype=np.int64)
    x[32:64, 0] = _ramp(32, 1).ravel()  # one verbatim block, ch 0
    enc = flac_encode(x, 44100, 16, block_size=32)
    d = flac_decode(enc)
    assert d["n_frames"] == 3  # 32 + 32 + 6 (partial last)
    assert d["total_samples"] == 70
    assert (d["samples"] == x).all()
    # constant subframes make this dramatically smaller than verbatim
    assert len(enc) < len(flac_encode(x, 44100, 16, block_size=32,
                                      force_verbatim=True))


def test_roundtrip_wasted_bits():
    x = (_ramp(50, 2) // 8) * 8  # divisible by 2^3
    d = flac_decode(flac_encode(x, 16000, 16, block_size=16, wasted_bits=3))
    assert (d["samples"] == x).all()


def test_roundtrip_24_bit_and_16bit_blocksize_field():
    x = (np.arange(600).reshape(-1, 1) * 10007 - 3000000).astype(np.int64)
    d = flac_decode(flac_encode(x, 96000, 24, block_size=512))
    assert d["bits_per_sample"] == 24
    assert (d["samples"] == x).all()


def test_roundtrip_multibyte_frame_number():
    # >127 frames forces the 2-byte UTF-8-style coded number
    x = _ramp(16 * 130, 1)
    d = flac_decode(flac_encode(x, 8000, 16, block_size=16))
    assert d["n_frames"] == 130
    assert (d["samples"] == x).all()


def test_utf8_like_spot_values():
    assert _utf8_like_encode(0) == b"\x00"
    assert _utf8_like_encode(127) == b"\x7f"
    # 128 = UTF-8 two-byte 0xC2 0x80; 0x7FF = 0xDF 0xBF (same scheme)
    assert _utf8_like_encode(128) == b"\xc2\x80"
    assert _utf8_like_encode(0x7FF) == b"\xdf\xbf"
    assert _utf8_like_encode(0x800) == b"\xe0\xa0\x80"


def test_corruption_detected():
    x = _ramp(64, 1)
    enc = bytearray(flac_encode(x, 8000, 16, block_size=32))
    # flip one sample bit in the last frame body -> CRC-16 fires
    bad = bytearray(enc)
    bad[-5] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16|CRC-8|MD5|sync"):
        flac_decode(bytes(bad))
    # flip a bit in STREAMINFO md5 -> decoded-audio MD5 check fires
    bad2 = bytearray(enc)
    bad2[30] ^= 0x01  # inside the 16-byte md5 field (bytes 26..41)
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(bad2))


def test_typed_refusals():
    x = _ramp(32, 1)
    enc = flac_encode(x, 8000, 16, block_size=32)
    # find the first frame: it starts right after the metadata block
    fstart = 4 + 4 + 34
    assert enc[fstart] == 0xFF and enc[fstart + 1] & 0xFC == 0xF8
    # subframe header is the byte after the 5-byte fixed header +
    # 1-byte frame number + 1-byte blocksize-1 + 1-byte CRC-8; rewrite
    # its type field to a reserved value — typed ValueError, no crash
    sub = fstart + 4 + 1 + 1 + 1
    bad = bytearray(enc)
    bad[sub] = 0b00000100  # reserved type 2 (byte = type << 1)
    with pytest.raises(ValueError, match="reserved subframe"):
        flac_decode(bytes(bad))
    # reserved channel assignment 11 -> ValueError (decorrelated
    # assignments 8..10 now DECODE; see the stereo round-trip tests)
    st = flac_encode(_ramp(32, 2), 8000, 16, block_size=32)
    bad2 = bytearray(st)
    hdr = bytearray(bad2[fstart : fstart + 4])
    hdr[3] = (11 << 4) | (hdr[3] & 0x0F)
    bad2[fstart : fstart + 4] = hdr
    bad2[fstart + 6] = _crc8_bitwise(bytes(bad2[fstart : fstart + 6]))
    with pytest.raises(ValueError, match="reserved channel"):
        flac_decode(bytes(bad2))
    # a decorrelated assignment in a MONO stream is malformed
    mono = flac_encode(_ramp(32, 1), 8000, 16, block_size=32)
    bad3 = bytearray(mono)
    hdr = bytearray(bad3[fstart : fstart + 4])
    hdr[3] = (8 << 4) | (hdr[3] & 0x0F)
    bad3[fstart : fstart + 4] = hdr
    bad3[fstart + 6] = _crc8_bitwise(bytes(bad3[fstart : fstart + 6]))
    with pytest.raises(ValueError, match="decorrelated channel"):
        flac_decode(bytes(bad3))


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="fLaC"):
        flac_decode(b"RIFF" + b"\x00" * 100)


def test_encoder_validates_inputs():
    with pytest.raises(ValueError, match="range 16"):
        flac_encode(_ramp(10, 1), 8000, 16, block_size=4)
    with pytest.raises(ValueError, match="divisible"):
        flac_encode(_ramp(10, 1) | 1, 8000, 16, block_size=16,
                    wasted_bits=1)
    with pytest.raises(ValueError, match="exceed"):
        flac_encode(np.array([[40000]]), 8000, 16, block_size=16)


def test_flac_sample_stats_kernel(spark):
    from pagerank_hadoop_spark.operators.flac import flac_sample_stats
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    xs = {k: _ramp(40 + k, 1 + k % 2, off=11 * k) for k in range(6)}
    df = spark.createDataFrame(
        [
            (k, bytearray(flac_encode(x, 8000, 16, block_size=16)))
            for k, x in xs.items()
        ],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in flac_sample_stats(
            attach_media(df, __import__("pyspark.sql.functions",
                                        fromlist=["col"]).col("payload"),
                         media_type="audio/flac")
        ).collect()
    }
    for k, x in xs.items():
        flat = x.reshape(-1)
        assert rows[k]["n_samples"] == x.shape[0]
        assert rows[k]["channels"] == x.shape[1]
        assert rows[k]["energy"] == int((flat * flat).sum())
        assert rows[k]["peak"] == int(np.abs(flat).max())


def test_roundtrip_fixed_all_orders_partitions_escape():
    rng = np.random.default_rng(7)
    for order in range(5):
        for po in (0, 1, 2):
            for esc in (False, True):
                n = 101  # 3 full 32-blocks + partial 5-sample tail
                i = np.arange(n)
                base = sum(
                    ((order + 2 - d) * i**d) // (d + 1)
                    for d in range(order + 1)
                )
                x = np.stack(
                    [
                        (base + rng.integers(-30, 30, n)) % 4000 - 2000,
                        (base * 2 + rng.integers(-5, 5, n)) % 3000 - 1500,
                    ],
                    axis=1,
                )
                d = flac_decode(
                    flac_encode(
                        x, 8000, 16, block_size=32, fixed_order=order,
                        partition_order=po, rice_escape=esc,
                    )
                )
                assert (d["samples"] == x).all(), (order, po, esc)


def test_fixed_compresses_ramps():
    ramp = (np.arange(500) % 3000 - 1500).reshape(-1, 1)
    e_fixed = flac_encode(ramp, 8000, 16, block_size=250, fixed_order=1)
    e_verb = flac_encode(ramp, 8000, 16, block_size=250,
                         force_verbatim=True)
    assert len(e_fixed) < len(e_verb) / 3
    assert (flac_decode(e_fixed)["samples"] == ramp).all()


def test_fixed_with_wasted_bits_and_noise():
    rng = np.random.default_rng(11)
    x = rng.integers(-2000, 2000, (64, 1)) * 4
    d = flac_decode(
        flac_encode(x, 8000, 16, block_size=32, fixed_order=2,
                    wasted_bits=2)
    )
    assert (d["samples"] == x).all()
    # full-range noise at order 0 stresses high Rice parameters /
    # the escape-cost comparison
    y = rng.integers(-32768, 32768, (300, 2))
    d2 = flac_decode(flac_encode(y, 48000, 16, block_size=64,
                                 fixed_order=0))
    assert (d2["samples"] == y).all()


def test_reserved_residual_method_rejected():
    x = _ramp(32, 1)
    enc = bytearray(flac_encode(x, 8000, 16, block_size=32,
                                fixed_order=0))
    fstart = 4 + 4 + 34
    # subframe byte: 0 pad + 001000 (FIXED order 0) + wasted 0 ->
    # 0b00010000; the next two bits are the residual coding method.
    sub = fstart + 4 + 1 + 1 + 1
    assert enc[sub] == 0b00010000
    bad = bytearray(enc)
    bad[sub + 1] |= 0b10000000  # method 0 -> 2 (reserved)
    with pytest.raises(ValueError, match="residual coding method"):
        flac_decode(bytes(bad))


def test_roundtrip_lpc_orders_and_shifts():
    rng = np.random.default_rng(3)
    cases = [([1], 0), ([3, -1], 1), ([205, -102], 7), ([29, -18, 5], 4),
             ([10, -4, 3, -2, 1, 1, -1, 2], 3),
             ([int(c) for c in rng.integers(-100, 100, 32)], 6)]
    for coef, shift in cases:
        x = rng.integers(-3000, 3000, (101, 2))
        for po, esc in ((0, False), (2, True)):
            d = flac_decode(
                flac_encode(x, 8000, 16, block_size=32, lpc_coef=coef,
                            lpc_shift=shift, partition_order=po,
                            rice_escape=esc)
            )
            assert (d["samples"] == x).all(), (coef, shift, po, esc)


def test_lpc_compresses_smooth_signals():
    i = np.arange(400)
    smooth = ((50 * np.sin(i / 20)).astype(np.int64) + i).reshape(-1, 1)
    e_lpc = flac_encode(smooth, 8000, 16, block_size=200,
                        lpc_coef=[4, -2], lpc_shift=1)
    e_verb = flac_encode(smooth, 8000, 16, block_size=200,
                         force_verbatim=True)
    assert len(e_lpc) < len(e_verb) / 3
    assert (flac_decode(e_lpc)["samples"] == smooth).all()


def test_roundtrip_stereo_decorrelation_all_modes():
    rng = np.random.default_rng(5)
    for mode in ("left_side", "right_side", "mid_side"):
        for opts in ({}, {"fixed_order": 2},
                     {"lpc_coef": [2, -1], "lpc_shift": 0},
                     {"fixed_order": 1, "partition_order": 2,
                      "rice_escape": True}):
            base = rng.integers(-15000, 15000, 101)
            x = np.stack([base + rng.integers(-100, 100, 101),
                          base + rng.integers(-100, 100, 101)], axis=1)
            d = flac_decode(flac_encode(x, 44100, 16, block_size=32,
                                        stereo_mode=mode, **opts))
            assert (d["samples"] == x).all(), (mode, opts)
    # extremes: the side channel needs bps+1; mid's LSB comes from the
    # side's parity — full-range corners catch both
    x = np.array([[32767, -32768], [-32768, 32767], [0, -32768],
                  [32767, 0]] * 8, dtype=np.int64)
    for mode in ("left_side", "right_side", "mid_side"):
        d = flac_decode(flac_encode(x, 8000, 16, block_size=16,
                                    stereo_mode=mode))
        assert (d["samples"] == x).all(), mode


def test_decorrelation_compresses_correlated_stereo():
    rng = np.random.default_rng(9)
    base = (np.cumsum(rng.integers(-50, 51, 400))).clip(-30000, 30000)
    x = np.stack([base, base + rng.integers(-3, 4, 400)], axis=1)
    e_ms = flac_encode(x, 44100, 16, block_size=200,
                       stereo_mode="mid_side", fixed_order=1)
    e_ind = flac_encode(x, 44100, 16, block_size=200, fixed_order=1)
    assert len(e_ms) < len(e_ind)
    assert (flac_decode(e_ms)["samples"] == x).all()


def test_lpc_malformed_rejected():
    x = _ramp(32, 1)
    enc = bytearray(flac_encode(x, 8000, 16, block_size=32,
                                lpc_coef=[1], lpc_shift=0))
    fstart = 4 + 4 + 34
    sub = fstart + 4 + 1 + 1 + 1
    assert enc[sub] == 0b01000000  # LPC order 1 (type 32; byte=type<<1)
    # warm-up is 16 bits (bytes sub+1, sub+2); the next 4 bits are
    # precision-1 in the HIGH nibble of sub+3. Force precision code 15
    # (invalid) — decoder must reject before reading coefficients
    bad = bytearray(enc)
    bad[sub + 3] |= 0b11110000
    with pytest.raises(ValueError, match="precision code 15"):
        flac_decode(bytes(bad))


def test_flac_meta_tags_padding_and_decode_coexist():
    from pagerank_hadoop_spark.operators.flac import flac_meta

    x = _ramp(40, 1)
    enc = flac_encode(
        x, 8000, 16, block_size=16,
        tags=[("TITLE", "doc 7"), ("artist", "unit test"), ("LANG", "en")],
        vendor="twin", padding=37,
    )
    m = flac_meta(enc)
    assert m["tags"] == {"TITLE": "doc 7", "ARTIST": "unit test",
                        "LANG": "en"}
    assert m["vendor"] == "twin"
    assert m["padding_bytes"] == 37
    assert m["n_blocks"] == 3
    assert m["total_samples"] == 40
    # tagged streams still DECODE (the frame walk skips the new blocks)
    assert (flac_decode(enc)["samples"] == x).all()
    # untagged stream: a single STREAMINFO block, no tags
    plain = flac_meta(flac_encode(x, 8000, 16, block_size=16))
    assert plain["n_blocks"] == 1 and plain["tags"] == {}
    with pytest.raises(ValueError, match="fLaC"):
        flac_meta(b"\x00" * 64)


def test_decode_media_routes_flac(spark):
    from pagerank_hadoop_spark.operators.flac import flac_meta
    from pagerank_hadoop_spark.operators.multimodal import (
        attach_media,
        decode_media,
    )
    from pyspark.sql import functions as F

    enc = flac_encode(_ramp(48, 2), 22050, 16, block_size=16)
    df = spark.createDataFrame(
        [(1, bytearray(enc))], "media_id long, payload binary"
    )
    row = decode_media(
        attach_media(df, F.col("payload"), media_type="audio/flac"),
        strict=True,
    ).collect()[0]
    # (width, height, n_frames) = (rate, channels, samples), the WAV
    # convention — and it must round through flac_meta, not the fake
    m = flac_meta(enc)
    assert (row["width"], row["height"], row["n_frames"]) == (
        m["sample_rate"], m["channels"], m["total_samples"],
    ) == (22050, 2, 48)


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    data=st.data(),
    n=st.integers(min_value=17, max_value=90),
    channels=st.integers(min_value=1, max_value=2),
    coding=st.sampled_from(["auto", "fixed", "lpc"]),
    stereo=st.sampled_from([None, "left_side", "right_side", "mid_side"]),
    po=st.integers(min_value=0, max_value=3),
    esc=st.booleans(),
)
def test_property_roundtrip_identity(data, n, channels, coding, stereo,
                                     po, esc):
    """Lossless means LOSSLESS: any int16 signal, any encoder knob
    combination in the supported surface, encode→decode is identity."""
    if stereo is not None:
        channels = 2
    flat = data.draw(
        st.lists(st.integers(-32768, 32767), min_size=n * channels,
                 max_size=n * channels)
    )
    x = np.array(flat, dtype=np.int64).reshape(n, channels)
    opts = {}
    if coding == "fixed":
        opts["fixed_order"] = data.draw(st.integers(0, 4))
    elif coding == "lpc":
        order = data.draw(st.integers(1, 6))
        opts["lpc_coef"] = data.draw(
            st.lists(st.integers(-300, 300), min_size=order,
                     max_size=order)
        )
        opts["lpc_shift"] = data.draw(st.integers(0, 10))
    enc = flac_encode(x, 8000, 16, block_size=16, stereo_mode=stereo,
                      partition_order=po, rice_escape=esc, **opts)
    d = flac_decode(enc)
    assert (d["samples"] == x).all()


def test_picture_seektable_blocks_roundtrip():
    from pagerank_hadoop_spark.operators.flac import flac_meta

    bmp = b"BM" + bytes(100)  # payload opacity: any bytes carry through
    x = _ramp(20, 1)
    enc = flac_encode(
        x, 8000, 16, block_size=16,
        tags=[("TITLE", "t")],
        seek_points=[(0, 0, 16), (16, 100, 4)],
        pictures=[{"pic_type": 3, "mime": "image/bmp",
                   "description": "cover", "width": 5, "height": 4,
                   "depth": 24, "data": bmp}],
    )
    m = flac_meta(enc)
    assert m["seek_points"] == 2
    assert len(m["pictures"]) == 1
    pic = m["pictures"][0]
    assert pic["data"] == bmp
    assert (pic["mime"], pic["description"], pic["width"],
            pic["height"], pic["depth"]) == ("image/bmp", "cover", 5, 4, 24)
    # blocks: STREAMINFO + VORBIS_COMMENT + SEEKTABLE + PICTURE
    assert m["n_blocks"] == 4
    # audio still decodes with all block types present
    assert (flac_decode(enc)["samples"] == x).all()


def test_roundtrip_rice2_method():
    """Residual coding method 1 (RICE2, 5-bit parameters): the decode
    branch the 4-bit default never exercises, incl. its distinct
    escape code (31)."""
    rng = np.random.default_rng(13)
    for order_kw in ({"fixed_order": 2},
                     {"lpc_coef": [3, -1], "lpc_shift": 1}):
        for esc in (False, True):
            x = rng.integers(-3000, 3000, (101, 2))
            enc = flac_encode(x, 8000, 16, block_size=32, rice_method=1,
                              partition_order=1, rice_escape=esc,
                              **order_kw)
            d = flac_decode(enc)
            assert (d["samples"] == x).all(), (order_kw, esc)


def test_unknown_metadata_block_skipped():
    from pagerank_hadoop_spark.operators.flac import flac_meta

    x = _ramp(20, 1)
    enc = bytearray(flac_encode(x, 8000, 16, block_size=16))
    # splice an APPLICATION block (type 2) after STREAMINFO: clear the
    # last-block flag on STREAMINFO, insert header+body before frames
    assert enc[4] == 0x80  # last | STREAMINFO
    enc[4] = 0x00
    app = bytes([0x82]) + (8).to_bytes(3, "big") + b"APPLbody"
    spliced = bytes(enc[: 4 + 4 + 34]) + app + bytes(enc[4 + 4 + 34 :])
    m = flac_meta(spliced)
    assert m["n_blocks"] == 2
    # unknown types are walked over, audio still decodes
    assert (flac_decode(spliced)["samples"] == x).all()


def test_flac_window_fingerprint_kernel(spark):
    """r12: the audio perceptual fingerprint — window cut, short-tail
    drop, integer-exact cell-energy bits, per-window md5 — against a
    NumPy-independent reference computation, incl. a one-sample
    "re-master" whose window-0 bytes differ but fingerprint agrees."""
    import hashlib

    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.flac import (
        flac_window_fingerprint,
    )
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    total = 512 * 2 + 5  # two windows + dropped tail
    i = np.arange(total, dtype=np.int64)
    x = (23 * i + 7) % 2000 - 1000
    xc = x.copy()
    xc[0] += 1
    df = spark.createDataFrame(
        [
            (0, bytearray(flac_encode(x[:, None], 8000, 16,
                                      block_size=256))),
            (1, bytearray(flac_encode(xc[:, None], 8000, 16,
                                      block_size=256))),
        ],
        "media_id long, payload binary",
    )
    out = flac_window_fingerprint(
        attach_media(df, F.col("payload"), media_type="audio/flac")
    ).collect()
    rows = {(r["media_id"], r["window_idx"]): r for r in out}
    assert len(rows) == 4  # 2 files x 2 windows, tail dropped

    def ref_fp(vals):
        cell = [
            sum(int(v) * int(v) for v in vals[g * 8 : g * 8 + 8])
            for g in range(64)
        ]
        tot = sum(cell)
        return "".join("1" if 64 * c > tot else "0" for c in cell)

    for mid, pcm in ((0, x), (1, xc)):
        for wi in range(2):
            w = pcm[wi * 512 : (wi + 1) * 512]
            r = rows[(mid, wi)]
            assert r["fp"] == ref_fp(w.tolist())
            assert r["pcm_md5"] == hashlib.md5(
                ",".join(str(v) for v in w.tolist()).encode()
            ).hexdigest()
    # the re-master: window 0 bytes differ, window 1 identical
    assert rows[(0, 0)]["pcm_md5"] != rows[(1, 0)]["pcm_md5"]
    assert rows[(0, 1)]["pcm_md5"] == rows[(1, 1)]["pcm_md5"]


def test_seek_decode_is_truly_random_access():
    """r12: flac_decode_frame_at reads ONE frame's bytes — corrupting
    every other frame breaks the full decode but not the seeked one;
    validation still fires on the seeked frame itself and on
    table/frame mismatches."""
    from pagerank_hadoop_spark.operators.flac import (
        flac_decode,
        flac_decode_frame_at,
    )

    total = 64 * 4 - 3
    i = np.arange(total, dtype=np.int64)
    x = (19 * i + 5) % 3000 - 1500
    payload = bytearray(
        flac_encode(x[:, None], 8000, 16, block_size=64,
                    fixed_order=2, partition_order=1,
                    seek_points="auto")
    )
    d = flac_decode_frame_at(bytes(payload), 2)
    assert d["sample_number"] == 128 and d["n"] == 64
    assert (d["samples"][:, 0] == x[128:192]).all()
    # short-tail last frame: the auto table records 61 samples
    dl = flac_decode_frame_at(bytes(payload), 3)
    assert dl["n"] == 61 and (dl["samples"][:, 0] == x[192:]).all()

    # locate frame byte ranges via the table, then corrupt every
    # frame EXCEPT #2 (flip a mid-frame byte, far from the header)
    from pagerank_hadoop_spark.operators.flac import flac_meta

    meta = flac_meta(bytes(payload))
    assert meta["seek_points"] == 4
    # frames start right after the metadata walk: find via decode of
    # point 0's offset being 0 -> derive frames_start by scanning for
    # the first frame sync after the last metadata block
    pos = 4
    while True:
        last = payload[pos] >> 7
        pos += 4 + int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if last:
            break
    frames_start = pos
    # read the four offsets straight out of the stream's SEEKTABLE
    p2 = 4
    offs = []
    while True:
        last = payload[p2] >> 7
        btype = payload[p2] & 0x7F
        blen = int.from_bytes(payload[p2 + 1 : p2 + 4], "big")
        if btype == 3:
            for k in range(blen // 18):
                o = p2 + 4 + 18 * k
                offs.append(int.from_bytes(payload[o + 8 : o + 16], "big"))
        p2 += 4 + blen
        if last:
            break
    assert offs[0] == 0 and sorted(offs) == offs and len(offs) == 4
    for fi, off in enumerate(offs):
        if fi == 2:
            continue
        payload[frames_start + off + 6] ^= 0xFF  # inside the header/data
    with pytest.raises(ValueError):
        flac_decode(bytes(payload))  # full decode touches everything
    d2 = flac_decode_frame_at(bytes(payload), 2)  # seek does not
    assert (d2["samples"][:, 0] == x[128:192]).all()
    with pytest.raises(ValueError):
        flac_decode_frame_at(bytes(payload), 1)  # the corrupt frame

    # a lying seekpoint (sample number not matching the frame) fails
    bad = bytearray(
        flac_encode(x[:, None], 8000, 16, block_size=64,
                    seek_points=[(64, 0, 64)])
    )
    with pytest.raises(ValueError, match="does not match"):
        flac_decode_frame_at(bytes(bad), 0)
    with pytest.raises(ValueError, match="no SEEKTABLE"):
        flac_decode_frame_at(
            flac_encode(x[:, None], 8000, 16, block_size=64), 0
        )


def test_variable_blocksize_roundtrip_and_seek():
    """r12: blocking strategy 1 — frames self-describe their sizes,
    headers code first-sample numbers, STREAMINFO min/max differ, and
    strategy-1 seek validates against the sample number directly."""
    from pagerank_hadoop_spark.operators.flac import (
        flac_decode,
        flac_decode_frame_at,
    )

    x = ((np.arange(120, dtype=np.int64) * 17 + 3) % 2000 - 1000)[:, None]
    payload = flac_encode(
        x, 8000, 16, block_sizes=[32, 16, 48, 24], seek_points="auto"
    )
    d = flac_decode(payload)
    assert (d["samples"] == x).all() and d["n_frames"] == 4
    assert payload[8:10] == (16).to_bytes(2, "big")  # min blocksize
    assert payload[10:12] == (48).to_bytes(2, "big")  # max blocksize
    for idx, (start, n) in enumerate([(0, 32), (32, 16), (48, 48), (96, 24)]):
        s = flac_decode_frame_at(payload, idx)
        assert s["sample_number"] == start and s["n"] == n
        assert (s["samples"][:, 0] == x[start : start + n, 0]).all()
    with pytest.raises(ValueError, match="sum"):
        flac_encode(x, 8000, 16, block_sizes=[32, 16])
    with pytest.raises(ValueError, match="16..65535"):
        flac_encode(x, 8000, 16, block_sizes=[110, 10])
    # r13 (ADVICE): all-equal sizes would write STREAMINFO min==max,
    # which RFC 9639 defines as a FIXED-blocksize stream and would
    # contradict the strategy-1 frame headers — rejected up front
    with pytest.raises(ValueError, match="fixed-blocksize"):
        flac_encode(x[:64], 8000, 16, block_sizes=[32, 32])
    with pytest.raises(ValueError, match="fixed-blocksize"):
        flac_encode(x[:120], 8000, 16, block_sizes=[120])


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(16, 96), min_size=2, max_size=6),
    st.integers(0, 4),
    st.integers(0, 2),
    st.integers(0, 10_000),
)
def test_property_varblock_roundtrip_and_seek_equivalence(
    sizes, order, po, seed
):
    """Property (r12): for ANY variable block-size partition, the
    full decode is lossless AND every seekpoint's frame equals the
    corresponding slice of the full decode — seek and stream paths
    can never drift. All-equal partitions are excluded: since r13
    the encoder rejects them (they are fixed-blocksize streams by
    RFC 9639 §8.2 and must use block_size=)."""
    from hypothesis import assume

    from pagerank_hadoop_spark.operators.flac import (
        flac_decode,
        flac_decode_frame_at,
    )

    assume(len(set(sizes)) > 1)
    total = sum(sizes)
    i = np.arange(total, dtype=np.int64)
    x = ((31 * i + seed) % 4000 - 2000)[:, None]
    payload = flac_encode(
        x, 8000, 16, block_sizes=sizes, fixed_order=order,
        partition_order=po, seek_points="auto",
    )
    full = flac_decode(payload)["samples"]
    assert (full == x).all()
    start = 0
    for idx, n in enumerate(sizes):
        d = flac_decode_frame_at(payload, idx)
        assert d["sample_number"] == start and d["n"] == n
        assert (d["samples"] == full[start : start + n]).all()
        start += n


def test_seek_qa_matches_full_screen_on_stationary_defects(spark):
    """r12: for stationary defects the sampled screen's keep flag
    must agree with the full screen's — quiet and clipped files drop,
    healthy ones keep, from two probed frames."""
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.flac import (
        flac_quality_stats,
        flac_seek_quality_stats,
    )
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    i = np.arange(64 * 4, dtype=np.int64)
    cases = {
        0: (3 * i) % 100 - 50,            # all-quiet -> keep 0
        1: 32700 + i % 60 - 30,           # clipped -> keep 0
        2: (19 * i + 5) % 3000 - 1500,    # healthy -> keep 1
    }
    df = spark.createDataFrame(
        [
            (k, bytearray(flac_encode(x[:, None], 8000, 16,
                                      block_size=64,
                                      seek_points="auto")))
            for k, x in cases.items()
        ],
        "media_id long, payload binary",
    )
    media = attach_media(df, F.col("payload"), media_type="audio/flac")
    sampled = {r["media_id"]: r for r in
               flac_seek_quality_stats(media).collect()}
    full = {r["media_id"]: r for r in
            flac_quality_stats(media).collect()}
    for k in cases:
        assert sampled[k]["keep"] == full[k]["keep"] == (1 if k == 2 else 0)
        assert sampled[k]["n_probed"] == 128  # two 64-sample frames


def test_flac_phase_fingerprints_alignment_and_phase0_identity(spark):
    """r13: the phase-swept kernel. (1) phase 0 is bit-for-bit
    flac_window_fingerprint; (2) the containment theorem: a clip
    excerpted at offset o produces, at phase p = (-o) mod window,
    EXACTLY the host's windows w >= ceil(o/window) — fp AND md5 —
    while no index-aligned join (phase 0 vs phase 0) matches;
    (3) phase_step validation raises."""
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.flac import (
        flac_phase_fingerprints,
        flac_window_fingerprint,
    )
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    total = 512 * 4 + 3
    i = np.arange(total, dtype=np.int64)
    host = (31 * i + 11) % 2000 - 1000
    o, length = 192, 512 * 2 + 64  # mid-file excerpt, not aligned
    clip = host[o : o + length]
    df = spark.createDataFrame(
        [
            (0, bytearray(flac_encode(host[:, None], 8000, 16,
                                      block_size=256))),
            (1, bytearray(flac_encode(clip[:, None], 8000, 16,
                                      block_size=256))),
        ],
        "media_id long, payload binary",
    )
    media = attach_media(df, F.col("payload"), media_type="audio/flac")
    swept = flac_phase_fingerprints(media, phase_step=64).collect()
    plain = flac_window_fingerprint(media).collect()

    # (1) phase-0 identity
    p0 = sorted(
        (r["media_id"], r["window_idx"], r["fp"], r["pcm_md5"])
        for r in swept if r["phase"] == 0
    )
    pw = sorted(
        (r["media_id"], r["window_idx"], r["fp"], r["pcm_md5"])
        for r in plain
    )
    assert p0 == pw

    # (2) alignment: clip phase (512 - 192) = 320 windows equal host
    # windows 1.. (clip[320 + 512*j : ...] == host[512*(j+1) : ...])
    host_rows = {
        r["window_idx"]: r for r in swept
        if r["media_id"] == 0 and r["phase"] == 0
    }
    clip_rows = {
        r["window_idx"]: r for r in swept
        if r["media_id"] == 1 and r["phase"] == 320
    }
    n_aligned = (length - 320) // 512
    assert n_aligned == len(clip_rows) == 1
    for j, r in clip_rows.items():
        assert r["fp"] == host_rows[j + 1]["fp"]
        assert r["pcm_md5"] == host_rows[j + 1]["pcm_md5"]
    # ...and the index-aligned join misses: no clip phase-0 window
    # shares bytes with any host window
    clip_p0 = [r for r in swept if r["media_id"] == 1 and r["phase"] == 0]
    host_md5s = {r["pcm_md5"] for r in host_rows.values()}
    assert clip_p0 and all(r["pcm_md5"] not in host_md5s for r in clip_p0)

    with pytest.raises(ValueError, match="phase_step"):
        flac_phase_fingerprints(media, phase_step=0)
    with pytest.raises(ValueError, match="divisible"):
        flac_phase_fingerprints(media, window=500, cells=64)
