"""H.264 I_PCM decode + ISO-BMFF sample demux ([EXT] E5, round 9).

The decoder (operators/h264.py) is pure stdlib+NumPy; most gates here
run without Spark. The one Spark test pins the Arrow kernel end-to-end
against the closed-form fixture formulas (the committed oracle gate,
media_mp4_frames, replays the same formulas in DuckDB).
"""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_hadoop_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    _ebsp_to_rbsp,
    _nal,
    _rbsp_to_ebsp,
    h264_decode_ipcm_frame,
    h264_parse_pps,
    h264_parse_sps,
    h264_pps_rbsp,
    h264_sps_rbsp,
    mp4_decode_ipcm_frames,
    mp4_demux_avc,
    mp4_mux_avc,
)

RNG = np.random.default_rng(2024)


def _frames(n: int, h: int, w: int, zero_runs: bool = True):
    out = []
    for _ in range(n):
        y = RNG.integers(0, 256, (h, w), dtype=np.uint8)
        cb = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        cr = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        if zero_runs:  # force 00-runs so emulation prevention is real
            y[0, :12] = 0
            cb[:3, :] = 0
        out.append((y, cb, cr))
    return out


def test_exp_golomb_roundtrip():
    w = _BitWriter()
    ue_vals = [0, 1, 2, 3, 7, 25, 255, 66000]
    se_vals = [0, 1, -1, 2, -2, 17, -31]
    for v in ue_vals:
        w.ue(v)
    for v in se_vals:
        w.se(v)
    r = _BitReader(w.rbsp_trailing())
    assert [r.ue() for _ in ue_vals] == ue_vals
    assert [r.se() for _ in se_vals] == se_vals


def test_emulation_prevention_roundtrip():
    raw = bytes([0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 9, 0, 0, 0])
    eb = _rbsp_to_ebsp(raw)
    assert b"\x00\x00\x03" in eb and len(eb) > len(raw)
    assert _ebsp_to_rbsp(eb) == raw
    # exhaustive short-string property: every 5-byte string of
    # {0,1,3,255} survives the insert/strip round trip
    from itertools import product

    for t in product((0, 1, 3, 255), repeat=5):
        b = bytes(t)
        assert _ebsp_to_rbsp(_rbsp_to_ebsp(b)) == b


@pytest.mark.parametrize(
    "n,h,w,chunks", [(1, 16, 16, 1), (3, 32, 48, 1), (5, 16, 32, 3), (4, 48, 16, 4)]
)
def test_mux_demux_decode_roundtrip(n, h, w, chunks):
    fs = _frames(n, h, w)
    payload = mp4_mux_avc(fs, n_chunks=chunks)
    dec = list(mp4_decode_ipcm_frames(payload))
    assert len(dec) == n
    for (idx, y, cb, cr), (ey, ecb, ecr) in zip(dec, fs):
        assert np.array_equal(y, ey)
        assert np.array_equal(cb, ecb)
        assert np.array_equal(cr, ecr)


def test_container_is_wellformed_for_meta_parser():
    # the independent r5 container parser agrees on the mux layout
    from pagerank_hadoop_spark.operators.multimodal import parse_mp4_meta

    payload = mp4_mux_avc(_frames(3, 32, 48))
    assert parse_mp4_meta(payload) == (120, 1000, 1, 48, 32)


def test_multichunk_stsc_map_matches_single_chunk():
    fs = _frames(6, 16, 16)
    one = mp4_demux_avc(mp4_mux_avc(fs, n_chunks=1))
    many = mp4_demux_avc(mp4_mux_avc(fs, n_chunks=4))
    assert one["samples"] == many["samples"]
    assert len(one["samples"]) == 6


def test_frame_cropping():
    fs = _frames(2, 32, 32)
    dec = list(mp4_decode_ipcm_frames(mp4_mux_avc(fs, crop=(0, 1, 0, 2))))
    for (idx, y, cb, cr), (ey, ecb, ecr) in zip(dec, fs):
        assert y.shape == (28, 30) and cb.shape == (14, 15)
        assert np.array_equal(y, ey[:28, :30])
        assert np.array_equal(cb, ecb[:14, :15])


def test_sps_parse_fields():
    sps = h264_parse_sps(h264_sps_rbsp(3, 2))
    assert sps["profile_idc"] == 66
    assert sps["width_mbs"] == 3 and sps["height_mbs"] == 2
    assert sps["poc_type"] == 2 and sps["log2_max_frame_num"] == 4


def test_cabac_pps_rejected():
    w = _BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(1, 1)  # entropy_coding_mode_flag = 1 (CABAC)
    with pytest.raises(NotImplementedError, match="CABAC"):
        h264_parse_pps(w.rbsp_trailing())


def _minimal_slice_nal(mb_type_bits, slice_type=7, nal_type=5):
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(slice_type)
    w.ue(0)  # pps id
    w.u(0, 4)  # frame_num
    if nal_type == 5:
        w.ue(0)  # idr_pic_id
        w.u(0, 1)
        w.u(0, 1)  # dec_ref_pic_marking
    w.se(0)  # slice_qp_delta
    if mb_type_bits is not None:
        w.ue(mb_type_bits)
    return _nal(3, nal_type, w.rbsp_trailing())


def test_transform_coded_mb_rejected():
    # mb_type 13 = I_16x16 with CodedBlockPatternLuma 15: AC residuals
    # are still outside the decodable subsets (I_PCM, cbp-0/0 I_16x16
    # DC-coefficient path, cbp-0 I_4x4 pure prediction)
    sps = h264_parse_sps(h264_sps_rbsp(1, 1))
    pps = h264_parse_pps(h264_pps_rbsp())
    with pytest.raises(NotImplementedError, match="AC/chroma residuals"):
        h264_decode_ipcm_frame(_minimal_slice_nal(13), sps, pps)


def test_b_slice_rejected_and_p_needs_reference():
    sps = h264_parse_sps(h264_sps_rbsp(1, 1))
    pps = h264_parse_pps(h264_pps_rbsp())
    # B slices (type 1/6) stay refused
    with pytest.raises(NotImplementedError, match="B/SP/SI"):
        h264_decode_ipcm_frame(
            _minimal_slice_nal(None, slice_type=6, nal_type=1), sps, pps
        )
    # P slices decode in the skip subset — but never without a
    # reference picture
    from pagerank_hadoop_spark.operators.h264 import h264_encode_pskip

    with pytest.raises(ValueError, match="no prior decoded reference"):
        h264_decode_ipcm_frame(h264_encode_pskip(1, 1, 1), sps, pps)


def test_pskip_roundtrip_and_refusals():
    import numpy as np

    from pagerank_hadoop_spark.operators.h264 import (
        _BitWriter,
        _nal,
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    y0 = np.fromfunction(lambda r, c: 20 + 2 * c + 3 * r, (32, 32)).astype(
        np.uint8
    )
    cb0 = np.fromfunction(lambda r, c: 15 + c + r, (16, 16)).astype(np.uint8)
    cr0 = np.fromfunction(lambda r, c: 9 + c + r, (16, 16)).astype(np.uint8)
    patch = (
        np.full((16, 16), 107, np.uint8),
        np.full((8, 8), 61, np.uint8),
        np.full((8, 8), 41, np.uint8),
    )
    nals = [
        h264_encode_ipcm(y0, cb0, cr0),
        h264_encode_pskip(2, 2, 1, {(1, 0): patch}),  # patch MB 1
        h264_encode_pskip(2, 2, 2),  # all-skip: exact repeat
    ]
    frames = list(
        mp4_decode_ipcm_frames(mp4_mux_avc(nals, dims=(32, 32), max_ref=1))
    )
    assert len(frames) == 3
    _, y1, cb1, cr1 = frames[1]
    exp_y = y0.copy()
    exp_y[0:16, 16:32] = patch[0]
    assert (y1 == exp_y).all()
    assert (cb1[0:8, 8:16] == patch[1]).all()
    assert (cb1[0:8, 0:8] == cb0[0:8, 0:8]).all()
    # frame 2 is the all-skip repeat of frame 1 — byte-identical
    assert (frames[2][1] == y1).all() and (frames[2][3] == cr1).all()

    # refusals: a P macroblock with motion vectors (mb_type 0) and a
    # non-PCM intra type inside a P slice
    sps = h264_parse_sps(h264_sps_rbsp(2, 2, max_ref=1))
    pps = h264_parse_pps(h264_pps_rbsp())
    ref = (y0, cb0, cr0)

    def p_slice_with(mb_type_code):
        w = _BitWriter()
        w.ue(0)  # first_mb_in_slice
        w.ue(5)  # slice_type P
        w.ue(0)  # pps id
        w.u(1, 4)  # frame_num
        w.u(0, 1)  # num_ref_idx_active_override
        w.u(0, 1)  # ref_pic_list_modification_flag_l0
        w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag
        w.se(0)  # slice_qp_delta
        w.ue(0)  # mb_skip_run 0
        w.ue(mb_type_code)
        w.u(0, 8)  # filler so parsing has bits to chew
        return _nal(2, 1, w.rbsp_trailing())

    # r13: every P partition shape (mb_types 0..4) now DECODES at
    # integer pel; the parse-level refusal is a B-shaped sub_mb_type
    # inside P_8x8 (Table 7-17 stops at 3)
    w2 = _BitWriter()
    w2.ue(0), w2.ue(5), w2.ue(0), w2.u(1, 4)
    w2.u(0, 1), w2.u(0, 1), w2.u(0, 1), w2.se(0)
    w2.ue(0)  # skip run
    w2.ue(3)  # mb_type P_8x8
    w2.ue(4)  # sub_mb_type 4: a B-slice shape
    w2.ue(0), w2.ue(0), w2.ue(0)  # remaining sub_mb_types
    w2.u(0, 8)
    with pytest.raises(NotImplementedError, match="B-slice shape"):
        h264_decode_ipcm_frame(
            _nal(2, 1, w2.rbsp_trailing()), sps, pps, ref
        )
    # intra-in-P now decodes the predicted types; one carrying AC
    # residuals (intra type 18 = I_16x16 with cbp luma) still refuses
    with pytest.raises(NotImplementedError, match="AC/chroma residuals"):
        h264_decode_ipcm_frame(p_slice_with(5 + 18), sps, pps, ref)
    # skip run overrunning the picture is malformed, not unsupported
    w = _BitWriter()
    w.ue(0), w.ue(5), w.ue(0), w.u(1, 4)
    w.u(0, 1), w.u(0, 1), w.u(0, 1), w.se(0)
    w.ue(9)  # 9 skips in a 4-MB picture
    with pytest.raises(ValueError, match="overruns the slice"):
        h264_decode_ipcm_frame(_nal(2, 1, w.rbsp_trailing()), sps, pps, ref)


def test_truncation_and_garbage_errors():
    payload = mp4_mux_avc(_frames(2, 16, 16))
    with pytest.raises(ValueError):
        list(mp4_decode_ipcm_frames(payload[:100]))
    with pytest.raises(ValueError, match="ISO-BMFF"):
        mp4_demux_avc(b"not an mp4 at all")
    # truncated mdat: sample overruns the file
    with pytest.raises(ValueError):
        list(mp4_decode_ipcm_frames(payload[:-40]))


def test_truncated_avcc_raises_typed_error():
    """A truncated avcC body must raise the typed ValueError, not a
    bare IndexError or silently short SPS bytes: shrink the avcC box
    in place (keep its declared length-prefix consistent) at several
    cut points — inside the fixed header, mid-SPS-length, mid-SPS
    payload, and before the PPS count."""
    payload = bytearray(mp4_mux_avc(_frames(1, 16, 16)))
    at = bytes(payload).find(b"avcC")
    assert at > 0
    box_start = at - 4
    box_len = int.from_bytes(payload[box_start : box_start + 4], "big")
    body_len = box_len - 8
    for keep in (3, 6, 7, 8, body_len - 2):
        if keep >= body_len:
            continue
        cut = bytearray(payload)
        # rewrite the box length and drop the tail bytes of the body
        cut[box_start : box_start + 4] = (8 + keep).to_bytes(4, "big")
        del cut[box_start + 8 + keep : box_start + 8 + body_len]
        with pytest.raises(ValueError, match="avcC"):
            mp4_demux_avc(bytes(cut))


def test_spark_kernel_matches_formula(spark):
    """End-to-end Arrow-kernel gate: the same pin the committed
    media_mp4_frames oracle enforces, on a 12-video subset."""
    import hashlib

    from pagerank_hadoop_spark.queries import _mp4_ipcm_fixture
    from pagerank_hadoop_spark.operators.h264 import mp4_frame_stats
    from pagerank_hadoop_spark.operators.multimodal import attach_media
    from pyspark.sql import functions as F

    media = attach_media(
        _mp4_ipcm_fixture(spark, n=12), F.col("payload"), media_type="video/mp4"
    )
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in mp4_frame_stats(media).collect()
    }
    n_rows = 0
    for key in range(12):
        w, h, nf = 16 * (1 + key % 3), 16 * (1 + key % 2), 1 + key % 3
        c = np.arange(w)[None, :]
        r_ = np.arange(h)[:, None]
        for f in range(nf):
            y = ((7 * c + 13 * r_ + 11 * f + key) % 256).astype(np.int64)
            row = got[(key, f)]
            assert (row["width"], row["height"]) == (w, h)
            assert row["y_sum"] == int(y.sum())
            csv = ",".join(str(v) for v in y.flatten())
            assert row["y_md5"] == hashlib.md5(csv.encode()).hexdigest()
            n_rows += 1
    assert len(got) == n_rows


def test_deemulation_vectorized_matches_sequential_twin():
    from itertools import product

    from pagerank_hadoop_spark.operators.h264 import _ebsp_to_rbsp_scan

    # exhaustive over every 6-byte alphabet-{0,1,3}| string — covers
    # every overlap/adjacency case of the 00 00 03 pattern
    for t in product((0, 1, 3), repeat=6):
        b = bytes(t)
        assert _ebsp_to_rbsp(b) == _ebsp_to_rbsp_scan(b), t
    # and on a real encoded payload
    raw = RNG.integers(0, 4, 5000, dtype=np.uint8).tobytes()
    eb = _rbsp_to_ebsp(raw)
    assert _ebsp_to_rbsp(eb) == _ebsp_to_rbsp_scan(eb) == raw


def test_ipcm_fast_path_matches_bitwise_loop():
    from pagerank_hadoop_spark.operators.h264 import (
        _BitReader,
        _read_ipcm_mb,
        _read_ipcm_samples,
    )

    fs = _frames(1, 32, 48)
    payload = mp4_mux_avc(fs)
    d = mp4_demux_avc(payload)
    nal = d["samples"][0][0]
    sps = h264_parse_sps(_ebsp_to_rbsp(d["sps"][0][1:]))
    pps = h264_parse_pps(_ebsp_to_rbsp(d["pps"][0][1:]))
    # decode once through the public path (fast path engages)
    idx, y, cb, cr = next(iter(mp4_decode_ipcm_frames(payload)))
    assert np.array_equal(y, fs[0][0])
    # replay the slice through the pure bitwise loop: skip the slice
    # header by reading up to the first MB via the public helpers
    rbsp = _ebsp_to_rbsp(nal[1:])

    def read_all_bitwise(r, n):
        return np.stack(
            [np.frombuffer(_read_ipcm_mb(r), dtype=np.uint8) for _ in range(n)]
        )

    # position two readers identically at slice_data by re-parsing the
    # header fields (same walk as h264_decode_ipcm_frame)
    def at_slice_data():
        r = _BitReader(rbsp)
        r.ue(); r.ue(); r.ue(); r.u(4); r.ue(); r.u(1); r.u(1); r.se()
        return r

    n_mbs = sps["width_mbs"] * sps["height_mbs"]
    fast = _read_ipcm_samples(at_slice_data(), n_mbs)
    slow = read_all_bitwise(at_slice_data(), n_mbs)
    assert np.array_equal(fast, slow)


def test_ahash_kernel_and_planted_clone_pairs(spark):
    """Integration pin on a 12-video subset of the committed
    media_video_ahash_dedup fixture: every planted clone pair
    surfaces with equal aHash and differing md5."""
    from pagerank_hadoop_spark.operators.h264 import mp4_frame_ahash
    from pagerank_hadoop_spark.operators.multimodal import attach_media
    from pagerank_hadoop_spark.queries import _mp4_ipcm_fixture_clones
    from pyspark.sql import functions as F

    media = attach_media(
        _mp4_ipcm_fixture_clones(spark, n=6), F.col("payload"),
        media_type="video/mp4",
    )
    rows = {(r["media_id"], r["frame_idx"]): r
            for r in mp4_frame_ahash(media).collect()}
    n_pairs = 0
    for key in range(6):
        for f in range(1 + key % 3):
            a, b = rows[(key, f)], rows[(key + 6, f)]
            assert a["ahash"] == b["ahash"]          # perceptual dup
            assert a["y_md5"] != b["y_md5"]          # not a byte dup
            assert len(a["ahash"]) == 64 and set(a["ahash"]) <= {"0", "1"}
            n_pairs += 1
    assert n_pairs == 12


def test_co64_and_sei_multinal_roundtrip():
    fs = _frames(4, 16, 32)
    for kwargs in ({"use_co64": True}, {"sei_per_sample": True},
                   {"use_co64": True, "sei_per_sample": True, "n_chunks": 3}):
        payload = mp4_mux_avc(fs, **kwargs)
        dec = list(mp4_decode_ipcm_frames(payload))
        assert len(dec) == 4, kwargs
        for (idx, y, cb, cr), (ey, ecb, ecr) in zip(dec, fs):
            assert np.array_equal(y, ey) and np.array_equal(cb, ecb)
    # SEI variant really does carry two NALs per sample
    d = mp4_demux_avc(mp4_mux_avc(fs, sei_per_sample=True))
    assert all(len(nals) == 2 and nals[0][0] & 0x1F == 6
               for nals in d["samples"])


def _sps_poc0_rbsp(width_mbs, height_mbs):
    """Hand-built SPS with pic_order_cnt_type 0 (the slice header
    then carries pic_order_cnt_lsb) — our encoder always emits type
    2, so this pins the other parse branch."""
    w = _BitWriter()
    w.u(66, 8); w.u(0xC0, 8); w.u(30, 8)
    w.ue(0)        # sps id
    w.ue(0)        # log2_max_frame_num_minus4
    w.ue(0)        # pic_order_cnt_type 0
    w.ue(0)        # log2_max_pic_order_cnt_lsb_minus4 -> u(4)
    w.ue(0)        # max_num_ref_frames
    w.u(0, 1)      # gaps
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1); w.u(1, 1); w.u(0, 1); w.u(0, 1)
    return w.rbsp_trailing()


def test_poc_type0_and_nonidr_slice_headers():
    from pagerank_hadoop_spark.operators.h264 import h264_pps_rbsp

    sps = h264_parse_sps(_sps_poc0_rbsp(1, 1))
    assert sps["poc_type"] == 0 and sps["log2_max_poc_lsb"] == 4
    pps = h264_parse_pps(h264_pps_rbsp())
    pcm = RNG.integers(0, 256, 384, dtype=np.uint8)

    def slice_nal(nal_type):
        w = _BitWriter()
        w.ue(0)            # first_mb_in_slice
        w.ue(7)            # slice_type I
        w.ue(0)            # pps id
        w.u(0, 4)          # frame_num
        if nal_type == 5:
            w.ue(0)        # idr_pic_id
        w.u(3, 4)          # pic_order_cnt_lsb (poc type 0)
        if nal_type == 5:
            w.u(0, 1); w.u(0, 1)   # dec_ref_pic_marking (IDR)
        else:
            w.u(0, 1)      # adaptive_ref_pic_marking_mode_flag = 0
        w.se(0)            # slice_qp_delta
        w.ue(25)           # I_PCM
        w.byte_align_zero()
        w.raw_bytes(pcm.tobytes())
        return _nal(3, nal_type, w.rbsp_trailing())

    for nal_type in (5, 1):
        y, cb, cr = h264_decode_ipcm_frame(slice_nal(nal_type), sps, pps)
        assert np.array_equal(y.flatten(), pcm[:256])
        assert np.array_equal(cb.flatten(), pcm[256:320])
        assert np.array_equal(cr.flatten(), pcm[320:])


def test_hypothesis_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 3),                      # frames
        st.sampled_from([16, 32, 48]),          # w
        st.sampled_from([16, 32]),              # h
        st.integers(1, 4),                      # chunks
        st.booleans(),                          # sei
        st.booleans(),                          # co64
        st.randoms(use_true_random=False),
    )
    def prop(n, w, h, chunks, sei, co64, rnd):
        seed = rnd.randint(0, 2**31)
        rng = np.random.default_rng(seed)
        fs = [
            (
                rng.integers(0, 256, (h, w), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
                rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
            )
            for _ in range(n)
        ]
        payload = mp4_mux_avc(
            fs, n_chunks=chunks, sei_per_sample=sei, use_co64=co64
        )
        dec = list(mp4_decode_ipcm_frames(payload))
        assert len(dec) == n
        for (idx, y, cb, cr), (ey, ecb, ecr) in zip(dec, fs):
            assert np.array_equal(y, ey)
            assert np.array_equal(cb, ecb)
            assert np.array_equal(cr, ecr)

    prop()


# ---------------------------------------------------------------------------
# r10: CAVLC single-coefficient I_16x16 DC-only subset
# ---------------------------------------------------------------------------


def _dc_resid(level, qp):
    """Independent replay of §8.5.10 for a position-0 single-coeff DC
    block (flat Hadamard spread): the per-pixel residual constant."""
    v = (10, 11, 13, 14, 16, 18)[qp % 6]
    if qp >= 36:
        d = (level * v) << (qp // 6 - 6)
    else:
        d = (level * v + (1 << (5 - qp // 6))) >> (6 - qp // 6)
    return (d + 32) >> 6


def test_cavlc_dc1_roundtrip_all_levels_positions():
    from pagerank_hadoop_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
        _ZIGZAG4,
        _cavlc_read_dc1,
        _cavlc_write_dc1,
    )

    for level in range(-7, 8):
        for pos in range(16):
            w = _BitWriter()
            _cavlc_write_dc1(w, level, pos)
            w.u(1, 1)  # padding so rbsp_trailing always has content
            c = _cavlc_read_dc1(_BitReader(w.rbsp_trailing()))
            exp = [[0] * 4 for _ in range(4)]
            if level:
                i, j = _ZIGZAG4[pos]
                exp[i][j] = level
            assert c == exp, (level, pos)
            if level == 0:
                break  # position is meaningless for the empty block


def test_dconly_row_frames_match_independent_recurrence():
    """Mux → demux → decode a 4-MB-wide DC-only row at qps spanning
    both §8.5.10 scaling branches; expected luma via the independent
    cumulative-DC-prediction recurrence, chroma pinned at 128."""
    import numpy as np

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    W = 4
    for qp in (12, 20, 26, 35, 36, 44, 51):
        levels = [(-6 + (2 * i + qp) % 13) for i in range(W)]
        nal = h264_encode_islice([("dc", lv, 0) for lv in levels], W, qp=qp)
        frames = list(
            mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(16, 16 * W)))
        )
        assert len(frames) == 1
        _, y, cb, cr = frames[0]
        c_prev, exp = None, []
        for lv in levels:
            pred = 128 if c_prev is None else c_prev
            c_prev = int(np.clip(pred + _dc_resid(lv, qp), 0, 255))
            exp.append(c_prev)
        expected = np.repeat(np.array(exp, np.uint8), 16)[None, :].repeat(16, 0)
        assert (y == expected).all(), (qp, levels)
        assert (cb == 128).all() and (cr == 128).all()


def test_dconly_grid_uses_top_and_left_dc_prediction():
    import numpy as np

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    levels = [3, -4, 5, -2]
    nal = h264_encode_islice([("dc", lv, 0) for lv in levels], 2, qp=30)
    _, y, cb, cr = next(
        iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(32, 32))))
    )
    ey = np.zeros((32, 32), np.int32)
    for mb, lv in enumerate(levels):
        mby, mbx = divmod(mb, 2)
        ls = (
            int(ey[mby * 16 : mby * 16 + 16, mbx * 16 - 1].sum())
            if mbx > 0
            else None
        )
        ts = (
            int(ey[mby * 16 - 1, mbx * 16 : mbx * 16 + 16].sum())
            if mby > 0
            else None
        )
        if ls is not None and ts is not None:
            pred = (ls + ts + 16) >> 5
        elif ls is not None:
            pred = (ls + 8) >> 4
        elif ts is not None:
            pred = (ts + 8) >> 4
        else:
            pred = 128
        ey[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = np.clip(
            pred + _dc_resid(lv, 30), 0, 255
        )
    assert (y == ey.astype(np.uint8)).all()
    assert (cb == 128).all() and (cr == 128).all()


def test_mixed_pcm_and_dconly_slices_both_orders():
    """A DC MB next to an I_PCM MB in one slice, both orders — the
    pcm-first order exercises the frame-level fallback from the
    vectorized all-I_PCM path into the general macroblock loop, and
    the DC MB's luma/chroma predictions read the PCM MB's
    reconstructed pixels."""
    import numpy as np

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    ypcm = ((np.arange(256).reshape(16, 16) * 3 + 7) % 256).astype(np.uint8)
    cbp = np.full((8, 8), 40, np.uint8)
    crp = np.full((8, 8), 200, np.uint8)
    pcm = ("pcm", (ypcm.tobytes(), cbp.tobytes(), crp.tobytes()))
    dc = ("dc", 4, 0)
    r28 = _dc_resid(4, 28)

    nal = h264_encode_islice([dc, pcm], 2, qp=28)
    _, y, cb, cr = next(
        iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(16, 32))))
    )
    assert (y[:, :16] == np.clip(128 + r28, 0, 255)).all()
    assert (y[:, 16:] == ypcm).all()

    nal = h264_encode_islice([pcm, dc], 2, qp=28)
    _, y, cb, cr = next(
        iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(16, 32))))
    )
    assert (y[:, :16] == ypcm).all()
    pred = (int(ypcm[:, 15].astype(np.int64).sum()) + 8) >> 4
    assert (y[:, 16:] == np.clip(pred + r28, 0, 255)).all()
    # chroma quadrants of the DC MB predict from the PCM MB's planes
    assert (cb[:, 8:] == 40).all() and (cr[:, 8:] == 200).all()


def test_dconly_typed_refusals():
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.h264 import (
        _BitReader,
        _BitWriter,
        _cavlc_read_dc1,
        h264_decode_ipcm_frame,
        h264_encode_islice,
        h264_parse_pps,
        h264_parse_sps,
        h264_pps_rbsp,
        h264_sps_rbsp,
    )

    sps = h264_parse_sps(h264_sps_rbsp(1, 1))
    pps = h264_parse_pps(h264_pps_rbsp())

    def _decode(mutate):
        nal = bytearray(h264_encode_islice([("dc", 4, 0)], 1, qp=28))
        return h264_decode_ipcm_frame(bytes(mutate(nal)), sps, pps)

    # coeff_token outside the tc<=1 subset: "001" prefix (tc=2, t1=2)
    w = _BitWriter()
    w.u(0b0011, 4)
    w.u(1, 4)
    with _pytest.raises(NotImplementedError, match="coeff_token"):
        _cavlc_read_dc1(_BitReader(w.rbsp_trailing()))
    # escape-coded level: 14 zeros of level_prefix
    w = _BitWriter()
    for b in "000101":  # coeff_token (1, 0)
        w.u(int(b), 1)
    w.u(0, 14)
    w.u(1, 10)
    with _pytest.raises(NotImplementedError, match="escape"):
        _cavlc_read_dc1(_BitReader(w.rbsp_trailing()))
    # encoder guards
    with _pytest.raises(ValueError, match="level"):
        h264_encode_islice([("dc", 9, 0)], 1)
    with _pytest.raises(ValueError, match="position"):
        h264_encode_islice([("dc", 4, 16)], 1)


def test_spark_dconly_kernel_matches_closed_form(spark):
    """End-to-end Arrow-kernel gate for the CAVLC DC-only subset: the
    same pin the committed media_mp4_dconly oracle enforces, on a
    24-video subset (covers the full qp 30..51 span, BOTH §8.5.10
    scaling branches, and every |level| 0..7). The expectation is an
    independent closed-form replay — prediction chain + residual
    constants — not the decoder's own arithmetic."""
    import hashlib

    from pagerank_hadoop_spark.queries import _mp4_dconly_fixture
    from pagerank_hadoop_spark.operators.h264 import _V00, mp4_frame_stats
    from pagerank_hadoop_spark.operators.multimodal import attach_media
    from pyspark.sql import functions as F

    def resid(level, qp):
        v00 = _V00[qp % 6]
        if qp >= 36:
            dc = (level * v00) << (qp // 6 - 6)
        else:
            dc = (level * v00 + (1 << (5 - qp // 6))) >> (6 - qp // 6)
        return (dc + 32) >> 6

    media = attach_media(
        _mp4_dconly_fixture(spark, n=24), F.col("payload"),
        media_type="video/mp4",
    )
    got = {
        (r["media_id"], r["frame_idx"]): r
        for r in mp4_frame_stats(media).collect()
    }
    n_rows = 0
    for key in range(24):
        wmb, nf, qp = 2 + key % 3, 1 + key % 2, 30 + key % 22
        for f in range(nf):
            pred = (
                sum((45 + 5 * r + 7 * f + key) % 256 for r in range(16)) + 8
            ) >> 4
            vs = []
            for k in range(1, wmb):
                lvl = (key * 3 + 2 * k + 5 * f) % 15 - 7
                pred = max(0, min(255, pred + resid(lvl, qp)))
                vs.append(pred)
            w = 16 * wmb
            raster = [
                (3 * (i % w) + 5 * (i // w) + 7 * f + key) % 256
                if i % w < 16
                else vs[(i % w) // 16 - 1]
                for i in range(w * 16)
            ]
            row = got[(key, f)]
            assert (row["width"], row["height"]) == (w, 16)
            assert row["y_sum"] == sum(raster)
            csv = ",".join(str(v) for v in raster)
            assert row["y_md5"] == hashlib.md5(csv.encode()).hexdigest()
            n_rows += 1
    assert len(got) == n_rows


def test_intra16_vhp_modes_match_independent_replay():
    """All four Intra16x16 luma modes + all four chroma modes against
    random-content I_PCM neighbours, verified by a from-scratch
    §8.3.3/§8.3.4 replay (direct formula evaluation over the PCM
    pixels — NOT the decoder's helper functions). Unlike the
    driver-gate fixture, the Plane macroblock's neighbours here have
    full per-pixel variety, so every one of the 8 (luma) / 4 (chroma)
    gradient terms is nonzero."""
    import numpy as np

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    qp = 34
    planes = []
    for _ in range(3):  # PCM at (0,0), (1,0), (0,1)
        planes.append(
            (
                RNG.integers(0, 256, (16, 16), dtype=np.uint8),
                RNG.integers(0, 256, (8, 8), dtype=np.uint8),
                RNG.integers(0, 256, (8, 8), dtype=np.uint8),
            )
        )
    lv = 5
    mbs = [
        ("pcm", tuple(p.tobytes() for p in planes[0])),
        ("pcm", tuple(p.tobytes() for p in planes[1])),
        ("pcm", tuple(p.tobytes() for p in planes[2])),
        ("i16", 3, 3, lv, 0),  # Plane luma + Plane chroma at (1,1)
    ]
    nal = h264_encode_islice(mbs, 2, qp=qp)
    _, y, cb, cr = next(
        iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(32, 32))))
    )

    def plane_replay(top, left, corner, size, mult):
        half = size // 2
        p = lambda row, c: corner if c < 0 else int(row[c])
        hs = sum(
            (i + 1) * (p(top, half + i) - p(top, half - 2 - i))
            for i in range(half)
        )
        vs = sum(
            (i + 1) * (p(left, half + i) - p(left, half - 2 - i))
            for i in range(half)
        )
        a = 16 * (int(top[size - 1]) + int(left[size - 1]))
        b = (mult * hs + 32) >> 6
        c_ = (mult * vs + 32) >> 6
        xs = np.arange(size, dtype=np.int64) - (half - 1)
        return np.clip((a + b * xs[None, :] + c_ * xs[:, None] + 16) >> 5, 0, 255)

    # luma plane at (1,1): top = bottom row of PCM(1,0), left = right
    # column of PCM(0,1), corner = PCM(0,0)[15,15]
    pred = plane_replay(
        planes[1][0][15, :].astype(np.int64),
        planes[2][0][:, 15].astype(np.int64),
        int(planes[0][0][15, 15]),
        16,
        5,
    )
    assert (y[16:, 16:] == np.clip(pred + _dc_resid(lv, qp), 0, 255)).all()
    for got, idx in ((cb, 1), (cr, 2)):
        predc = plane_replay(
            planes[1][idx][7, :].astype(np.int64),
            planes[2][idx][:, 7].astype(np.int64),
            int(planes[0][idx][7, 7]),
            8,
            34,
        )
        assert (got[8:, 8:] == predc).all()

    # V and H luma + V and H chroma against the same PCM content
    mbs = [
        ("pcm", tuple(p.tobytes() for p in planes[0])),
        ("i16", 1, 1, 2, 0),  # H luma + H chroma right of PCM
        ("i16", 0, 2, -3, 0),  # V luma + V chroma below PCM
        ("i16", 2, 0, 0, 0),  # DC luma + DC chroma (both neighbours)
    ]
    nal = h264_encode_islice(mbs, 2, qp=qp)
    _, y, cb, cr = next(
        iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(32, 32))))
    )
    ey_h = np.clip(
        planes[0][0][:, 15].astype(np.int64)[:, None] + _dc_resid(2, qp), 0, 255
    )
    assert (y[:16, 16:] == np.broadcast_to(ey_h, (16, 16))).all()
    ey_v = np.clip(
        planes[0][0][15, :].astype(np.int64)[None, :] + _dc_resid(-3, qp), 0, 255
    )
    assert (y[16:, :16] == np.broadcast_to(ey_v, (16, 16))).all()
    assert (cb[:8, 8:] == np.broadcast_to(planes[0][1][:, 7][:, None], (8, 8))).all()
    assert (cr[8:, :8] == np.broadcast_to(planes[0][2][7, :][None, :], (8, 8))).all()
    # DC MB at (1,1): luma pred over H-MB's bottom row + V-MB's right col
    ls = int(np.broadcast_to(ey_v, (16, 16))[:, 15].sum())
    ts = int(np.broadcast_to(ey_h, (16, 16))[15, :].sum())
    assert (y[16:, 16:] == np.clip((ls + ts + 16) >> 5, 0, 255)).all()


def test_intra16_availability_refusals():
    """V/H/Plane at picture edges where their neighbours don't exist
    are malformed streams: typed ValueError, never a wrong decode."""
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    def decode_single(mb):
        nal = h264_encode_islice([mb], 1, qp=30)
        next(iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(16, 16)))))

    with _pytest.raises(ValueError, match="vertical"):
        decode_single(("i16", 0, 0, 1, 0))
    with _pytest.raises(ValueError, match="horizontal"):
        decode_single(("i16", 1, 0, 1, 0))
    with _pytest.raises(ValueError, match="plane"):
        decode_single(("i16", 3, 0, 1, 0))
    with _pytest.raises(ValueError, match="horizontal chroma"):
        decode_single(("i16", 2, 1, 1, 0))
    with _pytest.raises(ValueError, match="vertical chroma"):
        decode_single(("i16", 2, 2, 1, 0))
    with _pytest.raises(ValueError, match="modes must be 0..3"):
        h264_encode_islice([("i16", 4, 0, 1, 0)], 1)


def test_islice_randomized_grids_match_reference_decoder():
    """Property gate over the whole decodable I-slice subset: random
    grids (1x1..3x3 macroblocks) mixing I_PCM and I_16x16 macroblocks
    with position-legal random prediction modes, random single-
    coefficient DC residuals at ANY zigzag position, and random slice
    qp — decoded by the production path and compared against a
    REFERENCE decoder written in matrix form (numpy Hadamard
    H·C·H, vectorized prediction assembly) rather than the
    production code's element loops. Catches cross-macroblock
    interaction bugs the per-mode gates cannot (mode availability on
    interior rows, PCM/predicted interleaving, residual placement at
    every scan position)."""
    import numpy as np

    from pagerank_hadoop_spark.operators.h264 import (
        _V00,
        _ZIGZAG4,
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    H4 = np.array(
        [[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
        np.int64,
    )

    def ref_decode(mbs, wmb, hmb, qp):
        y = np.zeros((hmb * 16, wmb * 16), np.int64)
        cb = np.zeros((hmb * 8, wmb * 8), np.int64)
        cr = np.zeros((hmb * 8, wmb * 8), np.int64)
        for mb, spec in enumerate(mbs):
            mby, mbx = divmod(mb, wmb)
            if spec[0] == "pcm":
                yb, cbb, crb = spec[1]
                y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = (
                    np.frombuffer(yb, np.uint8).reshape(16, 16)
                )
                cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = (
                    np.frombuffer(cbb, np.uint8).reshape(8, 8)
                )
                cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = (
                    np.frombuffer(crb, np.uint8).reshape(8, 8)
                )
                continue
            _, pm, cm, level, pos = spec
            # residual constants: inverse Hadamard in matrix form
            C = np.zeros((4, 4), np.int64)
            C[_ZIGZAG4[pos]] = level
            F_ = H4 @ C @ H4
            v00 = _V00[qp % 6]
            if qp >= 36:
                dc = (F_ * v00) * (1 << (qp // 6 - 6))
            else:
                # floor shift, elementwise, negatives included
                dc = (F_ * v00 + (1 << (5 - qp // 6))) >> (6 - qp // 6)
            R = np.repeat(np.repeat((dc + 32) >> 6, 4, 0), 4, 1)

            def pred16(plane, size):
                x0, y0 = mbx * size, mby * size
                top = plane[y0 - 1, x0 : x0 + size] if mby > 0 else None
                left = plane[y0 : y0 + size, x0 - 1] if mbx > 0 else None
                return top, left, (
                    int(plane[y0 - 1, x0 - 1]) if mbx > 0 and mby > 0 else None
                )

            top, left, corner = pred16(y, 16)
            if pm == 0:
                P = np.tile(top, (16, 1))
            elif pm == 1:
                P = np.tile(left[:, None], (1, 16))
            elif pm == 2:
                if top is not None and left is not None:
                    d = (int(top.sum()) + int(left.sum()) + 16) >> 5
                elif top is not None:
                    d = (int(top.sum()) + 8) >> 4
                elif left is not None:
                    d = (int(left.sum()) + 8) >> 4
                else:
                    d = 128
                P = np.full((16, 16), d, np.int64)
            else:
                hsum = sum(
                    (i + 1)
                    * (int(top[8 + i]) - (int(top[6 - i]) if 6 - i >= 0 else corner))
                    for i in range(8)
                )
                vsum = sum(
                    (i + 1)
                    * (int(left[8 + i]) - (int(left[6 - i]) if 6 - i >= 0 else corner))
                    for i in range(8)
                )
                a = 16 * (int(top[15]) + int(left[15]))
                b = (5 * hsum + 32) >> 6
                c_ = (5 * vsum + 32) >> 6
                xs = np.arange(16, dtype=np.int64)
                P = np.clip(
                    (a + b * (xs[None, :] - 7) + c_ * (xs[:, None] - 7) + 16) >> 5,
                    0,
                    255,
                )
            y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16] = np.clip(
                P + R, 0, 255
            )

            for plane in (cb, cr):
                topc, leftc, cornerc = pred16(plane, 8)
                if cm == 1:
                    Pc = np.tile(leftc[:, None], (1, 8))
                elif cm == 2:
                    Pc = np.tile(topc, (8, 1))
                elif cm == 3:
                    hs = sum(
                        (i + 1)
                        * (int(topc[4 + i]) - (int(topc[2 - i]) if 2 - i >= 0 else cornerc))
                        for i in range(4)
                    )
                    vs = sum(
                        (i + 1)
                        * (int(leftc[4 + i]) - (int(leftc[2 - i]) if 2 - i >= 0 else cornerc))
                        for i in range(4)
                    )
                    a = 16 * (int(topc[7]) + int(leftc[7]))
                    b = (34 * hs + 32) >> 6
                    c_ = (34 * vs + 32) >> 6
                    xs = np.arange(8, dtype=np.int64)
                    Pc = np.clip(
                        (a + b * (xs[None, :] - 3) + c_ * (xs[:, None] - 3) + 16)
                        >> 5,
                        0,
                        255,
                    )
                else:  # DC quadrants
                    Pc = np.empty((8, 8), np.int64)
                    for qy in range(2):
                        for qx in range(2):
                            lq = (
                                leftc[4 * qy : 4 * qy + 4]
                                if leftc is not None
                                else None
                            )
                            tq = (
                                topc[4 * qx : 4 * qx + 4]
                                if topc is not None
                                else None
                            )
                            if qx == qy:
                                if lq is not None and tq is not None:
                                    v = (int(lq.sum()) + int(tq.sum()) + 4) >> 3
                                else:
                                    cand = lq if lq is not None else tq
                                    v = (
                                        (int(cand.sum()) + 2) >> 2
                                        if cand is not None
                                        else 128
                                    )
                            else:
                                order = (tq, lq) if qx == 1 else (lq, tq)
                                v = 128
                                for cand in order:
                                    if cand is not None:
                                        v = (int(cand.sum()) + 2) >> 2
                                        break
                            Pc[4 * qy : 4 * qy + 4, 4 * qx : 4 * qx + 4] = v
                plane[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8] = Pc
        return y, cb, cr

    rng = np.random.default_rng(777)
    for trial in range(25):
        wmb, hmb = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        qp = int(rng.integers(0, 52))
        mbs = []
        for mb in range(wmb * hmb):
            mby, mbx = divmod(mb, wmb)
            if rng.random() < 0.4:
                mbs.append(
                    (
                        "pcm",
                        (
                            rng.integers(0, 256, 256, np.uint8).tobytes(),
                            rng.integers(0, 256, 64, np.uint8).tobytes(),
                            rng.integers(0, 256, 64, np.uint8).tobytes(),
                        ),
                    )
                )
                continue
            legal_l = [2] + ([0] if mby > 0 else []) + ([1] if mbx > 0 else [])
            legal_c = [0] + ([1] if mbx > 0 else []) + ([2] if mby > 0 else [])
            if mbx > 0 and mby > 0:
                legal_l.append(3)
                legal_c.append(3)
            mbs.append(
                (
                    "i16",
                    int(rng.choice(legal_l)),
                    int(rng.choice(legal_c)),
                    int(rng.integers(-7, 8)),
                    int(rng.integers(0, 16)),
                )
            )
        nal = h264_encode_islice(mbs, wmb, qp=qp)
        _, y, cb, cr = next(
            iter(
                mp4_decode_ipcm_frames(
                    mp4_mux_avc([nal], dims=(hmb * 16, wmb * 16))
                )
            )
        )
        ey, ecb, ecr = ref_decode(mbs, wmb, hmb, qp)
        assert (y == ey.astype(np.uint8)).all(), f"luma trial {trial}"
        assert (cb == ecb.astype(np.uint8)).all(), f"cb trial {trial}"
        assert (cr == ecr.astype(np.uint8)).all(), f"cr trial {trial}"


def test_i4x4_randomized_grids_match_gather_reference():
    """I_4x4 property gate: random grids mixing I_PCM, I_16x16 and
    I_4x4 macroblocks, each I_4x4 block drawing a position-legal
    random mode 0..8, decoded by the production path and compared
    against a reference that evaluates §8.3.1.2 in ARRAY-GATHER form
    (3-tap smoothing over the combined left+corner+top sample vector,
    indexed by diagonal) — structurally unlike the production
    per-pixel formula loops, so index slips in either implementation
    disagree. Also pins the prev/rem mode-prediction signaling: the
    encoder and decoder derive predIntra4x4PredMode independently,
    and a wrong derivation on either side decodes the wrong MODE,
    which the sample comparison catches."""
    import numpy as np

    from pagerank_hadoop_spark.operators.h264 import (
        _I4_SCAN,
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    def smooth3(c):
        c = c.astype(np.int64)
        return (c[:-2] + 2 * c[1:-1] + c[2:] + 2) >> 2

    def avg2(c):
        c = c.astype(np.int64)
        return (c[:-1] + c[1:] + 1) >> 1

    def ref_i4(y, px, py, mode, W):
        top_ok, left_ok = py > 0, px > 0
        t = y[py - 1, px : px + 4].astype(np.int64) if top_ok else None
        left = y[py : py + 4, px - 1].astype(np.int64) if left_ok else None
        z = int(y[py - 1, px - 1]) if top_ok and left_ok else None
        out = np.empty((4, 4), np.int64)
        xs = np.arange(4)
        if mode == 2:
            if top_ok and left_ok:
                return np.full((4, 4), (int(t.sum()) + int(left.sum()) + 4) >> 3)
            if top_ok:
                return np.full((4, 4), (int(t.sum()) + 2) >> 2)
            if left_ok:
                return np.full((4, 4), (int(left.sum()) + 2) >> 2)
            return np.full((4, 4), 128)
        if mode == 0:
            return np.tile(t, (4, 1))
        if mode == 1:
            return np.tile(left[:, None], (1, 4))
        if mode in (3, 7):
            # extended top with decode-order-aware top-right
            cy, cx = py // 4, px // 4
            # top-right pixels decoded iff inside pic AND the 4x4 cell
            # above-right precedes this block: with full-MB raster
            # reconstruction, that is "not (the cell belongs to the
            # same or a later MB column at a lower-or-equal scan pos)"
            # — derive it the dumb way: a cell is decoded iff its MB
            # precedes this MB, or same MB and earlier in _I4_SCAN.
            def decoded(ccx, ccy):
                if not (0 <= ccx < W // 4 and ccy >= 0):
                    return False
                mb_a = (ccy // 4) * (W // 16) + ccx // 4
                mb_b = (py // 16) * (W // 16) + px // 16
                if mb_a != mb_b:
                    return mb_a < mb_b
                ia = _I4_SCAN.index((ccx % 4, ccy % 4))
                ib = _I4_SCAN.index(((px // 4) % 4, (py // 4) % 4))
                return ia < ib

            if decoded(cx + 1, cy - 1):
                tr = y[py - 1, px + 4 : px + 8].astype(np.int64)
            else:
                tr = np.full(4, t[3], np.int64)
            t8 = np.concatenate([t, tr])
            if mode == 3:
                s = smooth3(t8)  # s[k] for k = x+y = 0..5
                for yy in range(4):
                    out[yy] = s[np.clip(xs + yy, 0, 5)]
                out[3, 3] = (t8[6] + 3 * t8[7] + 2) >> 2
                return out
            s2, s3 = avg2(t8), smooth3(t8)
            for yy in range(4):
                k = xs + (yy >> 1)
                out[yy] = s2[k] if yy % 2 == 0 else s3[k]
            return out
        if mode == 8:
            lext = np.concatenate([left, [left[3], left[3], left[3]]])
            s2, s3 = avg2(lext), smooth3(lext)
            for yy in range(4):
                for xx in range(4):
                    zhu = xx + 2 * yy
                    k = yy + (xx >> 1)
                    if zhu in (0, 2, 4):
                        out[yy, xx] = s2[k]
                    elif zhu in (1, 3):
                        out[yy, xx] = s3[k]
                    elif zhu == 5:
                        out[yy, xx] = (left[2] + 3 * left[3] + 2) >> 2
                    else:
                        out[yy, xx] = left[3]
            return out
        # modes 4/5/6 over the combined vector c = [l3 l2 l1 l0 z t0..t3]
        c = np.array(
            [left[3], left[2], left[1], left[0], z, t[0], t[1], t[2], t[3]],
            np.int64,
        )
        s3, s2 = smooth3(c), avg2(c)  # s3[i] centered at c[i+1]
        for yy in range(4):
            for xx in range(4):
                if mode == 4:
                    out[yy, xx] = s3[3 + xx - yy]  # centered at diag idx
                elif mode == 5:
                    zvr = 2 * xx - yy
                    k = xx - (yy >> 1)
                    if zvr >= 0 and zvr % 2 == 0:
                        out[yy, xx] = s2[4 + k]
                    elif zvr >= 0:
                        out[yy, xx] = s3[3 + k]
                    elif zvr == -1:
                        out[yy, xx] = s3[3]
                    else:
                        out[yy, xx] = s3[4 - (yy - 2 * xx)]
                else:
                    zhd = 2 * yy - xx
                    k = yy - (xx >> 1)
                    if zhd >= 0 and zhd % 2 == 0:
                        out[yy, xx] = s2[3 - k]
                    elif zhd >= 0:
                        out[yy, xx] = s3[3 - k]
                    elif zhd == -1:
                        out[yy, xx] = s3[3]
                    else:
                        out[yy, xx] = s3[2 + (xx - 2 * yy)]
        return out

    rng = np.random.default_rng(4242)
    for trial in range(20):
        wmb, hmb = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        mbs = []
        layout = []
        for mb in range(wmb * hmb):
            mby, mbx = divmod(mb, wmb)
            roll = rng.random()
            if roll < 0.34:
                mbs.append(
                    (
                        "pcm",
                        (
                            rng.integers(0, 256, 256, np.uint8).tobytes(),
                            rng.integers(0, 256, 64, np.uint8).tobytes(),
                            rng.integers(0, 256, 64, np.uint8).tobytes(),
                        ),
                    )
                )
                layout.append(None)
            elif roll < 0.5:
                legal = [2] + ([0] if mby > 0 else []) + ([1] if mbx > 0 else [])
                mbs.append(
                    ("i16", int(rng.choice(legal)), 0,
                     int(rng.integers(-7, 8)), 0)
                )
                layout.append(None)
            else:
                modes = []
                for idx in range(16):
                    bx, by = _I4_SCAN[idx]
                    py0, px0 = mby * 16 + by * 4, mbx * 16 + bx * 4
                    legal = [2]
                    if py0 > 0:
                        legal += [0, 3, 7]
                    if px0 > 0:
                        legal += [1, 8]
                    if py0 > 0 and px0 > 0:
                        legal += [4, 5, 6]
                    modes.append(int(rng.choice(legal)))
                mbs.append(("i4", modes, 0))
                layout.append(modes)
        nal = h264_encode_islice(mbs, wmb, qp=30)
        _, y, cb, cr = next(
            iter(
                mp4_decode_ipcm_frames(
                    mp4_mux_avc([nal], dims=(hmb * 16, wmb * 16))
                )
            )
        )
        # replay: PCM + i16 quadrants already gated elsewhere; rebuild
        # ONLY the i4 blocks from the production picture's neighbour
        # samples and compare (neighbours themselves are
        # production-reconstructed, so a bad i4 block corrupts later
        # blocks and still mismatches here)
        W = wmb * 16
        for mb, modes in enumerate(layout):
            if modes is None:
                continue
            mby, mbx = divmod(mb, wmb)
            for idx in range(16):
                bx, by = _I4_SCAN[idx]
                px, py = mbx * 16 + bx * 4, mby * 16 + by * 4
                exp = np.clip(ref_i4(y, px, py, modes[idx], W), 0, 255)
                got = y[py : py + 4, px : px + 4]
                assert (got == exp.astype(np.uint8)).all(), (
                    f"trial {trial} mb {mb} blk {idx} mode {modes[idx]}"
                )


def test_i4x4_refusals_and_signaling():
    """Typed boundaries of the I_4x4 subset: modes whose neighbours
    are outside the picture are malformed (ValueError); a nonzero
    coded_block_pattern codeword is honestly refused
    (NotImplementedError names the residual decoder); encoder input
    validation; and the prev-flag path is exercised by a mode that
    EQUALS the derived prediction (DC at the corner block)."""
    import numpy as np
    import pytest as _pytest

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    def decode_single(mb):
        nal = h264_encode_islice([mb], 1, qp=30)
        return next(
            iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(16, 16))))
        )

    with _pytest.raises(ValueError, match="vertical needs"):
        decode_single(("i4", 0, 0))
    with _pytest.raises(ValueError, match="horizontal needs"):
        decode_single(("i4", 1, 0))
    with _pytest.raises(ValueError, match="top, left and top-left"):
        decode_single(("i4", 4, 0))
    with _pytest.raises(ValueError, match="16 luma modes"):
        h264_encode_islice([("i4", [2] * 15, 0)], 1)
    with _pytest.raises(ValueError, match="16 luma modes"):
        h264_encode_islice([("i4", 9, 0)], 1)
    # all-DC single MB: every block's predicted mode IS 2, so the
    # encoder emits 16 prev flags and zero rem fields; all planes 128
    _, y, cb, cr = decode_single(("i4", 2, 0))
    assert (y == 128).all() and (cb == 128).all() and (cr == 128).all()
    # cbp != 0 refusal: hand-build the slice (encoder never writes it)
    from pagerank_hadoop_spark.operators.h264 import _BitWriter, _nal

    wr = _BitWriter()
    wr.ue(0); wr.ue(7); wr.ue(0); wr.u(0, 4); wr.ue(0)
    wr.u(0, 1); wr.u(0, 1); wr.se(0)
    wr.ue(0)  # mb_type I_4x4
    for _ in range(16):
        wr.u(1, 1)  # prev flags (all predicted = DC)
    wr.ue(0)  # chroma DC
    wr.ue(0)  # coded_block_pattern codeNum 0 -> cbp 47 (intra)
    nal = _nal(3, 5, wr.rbsp_trailing())
    with _pytest.raises(NotImplementedError, match="coded_block_pattern"):
        next(iter(mp4_decode_ipcm_frames(mp4_mux_avc([nal], dims=(16, 16)))))


def test_p_frame_first_mp4_rejected():
    """A stream whose first sample is a P slice has no reference —
    the MP4 decode path must surface the typed ValueError, and the
    generator must not leak a reference across separate payloads."""
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_pskip,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    bad = mp4_mux_avc(
        [h264_encode_pskip(1, 1, 0)], dims=(16, 16), max_ref=1
    )
    with pytest.raises(ValueError, match="no prior decoded reference"):
        list(mp4_decode_ipcm_frames(bad))


def test_intra_in_p_predicted_types_roundtrip():
    """r12: I_16x16 and cbp-0 I_4x4 macroblocks inside P slices
    reconstruct from the current picture — including SKIPPED
    neighbours' samples (constrained_intra_pred_flag = 0) — with the
    qp thread crossing mb_skip_run, and a frame-2 patch predicting
    from samples a frame-1 patch rewrote."""
    from pagerank_hadoop_spark.operators.h264 import (
        _dc_residual_constants,
        h264_encode_ipcm,
        h264_encode_pskip,
    )

    y0 = np.fromfunction(lambda r, c: 20 + 2 * c + 3 * r, (32, 32)).astype(
        np.uint8
    )
    cb0 = np.fromfunction(lambda r, c: 15 + c + r, (16, 16)).astype(np.uint8)
    cr0 = np.fromfunction(lambda r, c: 9 + c + r, (16, 16)).astype(np.uint8)
    sps = h264_parse_sps(h264_sps_rbsp(2, 2, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())
    f0 = h264_decode_ipcm_frame(h264_encode_ipcm(y0, cb0, cr0), sps, pps)

    # frame 1: I_16x16 V/V with DC level -6 at qp 40 on MB (0,1)
    dc = [[0] * 4 for _ in range(4)]
    dc[0][0] = -6
    k = _dc_residual_constants(dc, 40)[0][0]
    assert k != 0  # qp 40 is in the left-shift branch; residual bites
    p1 = h264_encode_pskip(2, 2, 1, {(0, 1): ("i16", 0, 2, -6, 0)}, qp=40)
    y1, cb1, cr1 = h264_decode_ipcm_frame(p1, sps, pps, ref=f0)
    exp = y0.astype(np.int64).copy()
    exp[16:32, 0:16] = np.clip(y0[15, 0:16].astype(np.int64) + k, 0, 255)
    assert (y1 == exp).all()
    expcb = cb0.astype(np.int64).copy()
    expcb[8:16, 0:8] = cb0[7, 0:8]  # chroma V copies row 7
    assert (cb1 == expcb).all() and (cr1[8:16, 0:8] == cr0[7, 0:8]).all()

    # frame 2: I_4x4 all-vertical + H chroma on MB (1,1); its chroma
    # source column 7 was rewritten by the frame-1 patch
    p2 = h264_encode_pskip(2, 2, 2, {(1, 1): ("i4", 0, 1)})
    y2, cb2, _ = h264_decode_ipcm_frame(p2, sps, pps, ref=(y1, cb1, cr1))
    exp2 = y1.astype(np.int64).copy()
    exp2[16:32, 16:32] = y1[15, 16:32].astype(np.int64)
    assert (y2 == exp2).all()
    expcb2 = cb1.astype(np.int64).copy()
    expcb2[8:16, 8:16] = cb1[8:16, 7].astype(np.int64)[:, None]
    assert (cb2 == expcb2).all()
    assert (cb2[8:16, 8:16] == cb0[7, 7]).all()  # the rewritten column

    # legacy bare plane-triple still means I_PCM
    p3 = h264_encode_pskip(
        2, 2, 3, {(0, 0): (y0[:16, :16], cb0[:8, :8], cr0[:8, :8])}
    )
    y3, _, _ = h264_decode_ipcm_frame(p3, sps, pps, ref=(y2, cb2, _))
    assert (y3[:16, :16] == y0[:16, :16]).all()
    assert (y3[16:, :] == y2[16:, :]).all()


def test_nonreference_picture_not_promoted_to_p_reference():
    """A disposable picture (nal_ref_idc == 0) must not become the
    prediction reference of a following P slice: the stream below
    repeats the IDR content in a non-reference I slice with DIFFERENT
    samples, then sends an all-skip P frame — which must reproduce
    the IDR (the last REFERENCE picture), not the disposable one."""
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_decode_ipcm_frames,
    )

    y0 = np.full((16, 16), 50, np.uint8)
    c0 = np.full((8, 8), 90, np.uint8)
    yd = np.full((16, 16), 200, np.uint8)  # disposable content
    idr = h264_encode_ipcm(y0, c0, c0)
    # frame 1: DISPOSABLE P frame (nal_ref_idc 0 — dec_ref_pic_marking
    # absent) patching the whole picture with I_PCM; frame 2: all-skip
    # REFERENCE P frame
    disposable = h264_encode_pskip(
        1, 1, 1,
        {(0, 0): (yd, np.full((8, 8), 10, np.uint8),
                  np.full((8, 8), 10, np.uint8))},
        disposable=True,
    )
    pskip = h264_encode_pskip(1, 1, 2)
    payload = mp4_mux_avc(
        [idr, disposable, pskip], dims=(16, 16), max_ref=1
    )
    frames = list(mp4_decode_ipcm_frames(payload))
    assert len(frames) == 3
    assert (frames[1][1] == yd).all()  # disposable still DISPLAYS
    assert (frames[2][1] == y0).all()  # skip copies the IDR, not yd


def test_multislice_picture_slice_scoped_availability():
    """r12: a multi-slice I picture decodes as ONE picture and intra
    prediction never crosses the slice boundary — MB3, alone in its
    slice, DC-predicts 128 even though both physical neighbours hold
    decoded samples; a slice-unaware decoder would average them."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        h264_encode_pskip,
    )

    a, qp = 20, 40
    y0 = np.fromfunction(lambda r, c: a + 2 * c + 3 * r, (16, 16)).astype(
        np.uint8
    )
    cb0 = np.fromfunction(lambda r, c: 15 + c + r, (8, 8)).astype(np.uint8)
    cr0 = np.fromfunction(lambda r, c: 9 + c + r, (8, 8)).astype(np.uint8)

    def rc(level):
        c = [[0] * 4 for _ in range(4)]
        c[0][0] = level
        return H._dc_residual_constants(c, qp)[0][0]

    mbs = [
        ("pcm", (y0.tobytes(), cb0.tobytes(), cr0.tobytes())),
        ("i16", 2, 1, 5, 0),   # MB1: DC luma (left = MB0), H chroma
        ("i16", 2, 2, -6, 0),  # MB2: DC luma (top = MB0), V chroma
        ("i16", 2, 0, 7, 0),   # MB3: alone in slice B -> 128 + rc
    ]
    sliceA = h264_encode_islice(mbs[:3], 2, qp=qp, first_mb=0)
    sliceB = h264_encode_islice(mbs[3:], 2, qp=qp, first_mb=3)
    sps = h264_parse_sps(h264_sps_rbsp(2, 2, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())
    y, cb, cr = H._h264_decode_picture([sliceA, sliceB], sps, pps)
    dc1 = (int(y0[:, 15].astype(np.int64).sum()) + 8) >> 4
    dc2 = (int(y0[15, :].astype(np.int64).sum()) + 8) >> 4
    assert (y[0:16, 0:16] == y0).all()
    assert (y[0:16, 16:32] == np.clip(dc1 + rc(5), 0, 255)).all()
    assert (y[16:32, 0:16] == np.clip(dc2 + rc(-6), 0, 255)).all()
    assert (y[16:32, 16:32] == np.clip(128 + rc(7), 0, 255)).all()
    assert (cb[8:16, 8:16] == 128).all()  # chroma DC, no same-slice nbrs

    # multi-slice P picture: slice B's patch sees the SKIPPED
    # same-slice MB2 as available (cip=0), never the other slice
    pA = h264_encode_pskip(2, 2, 1, None, qp=qp, first_mb=0, n_mbs=2)
    pB = h264_encode_pskip(
        2, 2, 1, {(1, 1): ("i16", 2, 1, -3, 0)}, qp=qp,
        first_mb=2, n_mbs=2,
    )
    v2 = int(y[16, 0])
    y2, cb2, _ = H._h264_decode_picture([pA, pB], sps, pps, (y, cb, cr))
    assert (y2[0:16, :] == y[0:16, :]).all()
    assert (y2[16:32, 0:16] == v2).all()  # skipped: reference copy
    assert (y2[16:32, 16:32] == np.clip(v2 + rc(-3), 0, 255)).all()
    assert (cb2[8:16, 8:16] == cb[8:16, 7][:, None]).all()  # H from skip

    # malformed slice sets are ValueErrors, not silent misdecodes
    with pytest.raises(ValueError, match="not 0"):
        H._h264_decode_picture([sliceB], sps, pps)
    with pytest.raises(ValueError, match="raster decode order"):
        H._h264_decode_picture([sliceA, sliceA], sps, pps)


def test_cross_slice_header_consistency_enforced():
    """r13 (ADVICE): §7.4.1.2.4 — all slices of one access unit share
    nal_unit_type, nal_ref_idc, and frame_num. A picture whose slices
    disagree must raise, not silently decode with slice_nals[0]'s
    values (which would mis-thread the DPB on mixed ref_idc)."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        h264_encode_pskip,
    )

    sps = h264_parse_sps(h264_sps_rbsp(2, 2, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())
    ref = (
        np.full((32, 32), 60, np.uint8),
        np.full((16, 16), 90, np.uint8),
        np.full((16, 16), 90, np.uint8),
    )

    # frame_num mismatch between two P slices of one picture
    pA = h264_encode_pskip(2, 2, 1, None, first_mb=0, n_mbs=2)
    pB_fn2 = h264_encode_pskip(2, 2, 2, None, first_mb=2, n_mbs=2)
    with pytest.raises(ValueError, match="frame_num"):
        H._h264_decode_picture([pA, pB_fn2], sps, pps, ref)

    # ref_idc mismatch: slice B disposable, slice A a reference slice
    pB_disp = h264_encode_pskip(
        2, 2, 1, None, first_mb=2, n_mbs=2, disposable=True
    )
    with pytest.raises(ValueError, match="ref_idc"):
        H._h264_decode_picture([pA, pB_disp], sps, pps, ref)

    # nal_type mismatch: IDR I slice + non-IDR P slice in one "picture"
    iA = h264_encode_islice([("dc", 3, 0), ("dc", 3, 0)], 2, first_mb=0)
    with pytest.raises(ValueError, match="nal_type"):
        H._h264_decode_picture([iA, pB_disp], sps, pps, ref)

    # consistent multi-slice P picture still decodes
    pB = h264_encode_pskip(2, 2, 1, None, first_mb=2, n_mbs=2)
    y, cb, cr = H._h264_decode_picture([pA, pB], sps, pps, ref)
    assert (y == ref[0]).all() and (cb == ref[1]).all()


def test_gop_seek_random_access():
    """r12: stss-driven seek decodes from the nearest preceding sync
    sample only — corrupting the OTHER GOP's bytes must not affect
    the seeked frame, and the full sequential decode must fail."""
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_decode_frame_seek,
    )

    def idr(a):
        y = np.fromfunction(
            lambda r, c: a + 2 * c + 3 * r, (16, 32)
        ).astype(np.uint8)
        cb = np.fromfunction(lambda r, c: 15 + c + r, (8, 16)).astype(
            np.uint8
        )
        return h264_encode_ipcm(y, cb, cb), y

    def patch(fn, mbx, b):
        return h264_encode_pskip(
            2, 1, fn,
            {(mbx, 0): (
                np.full((16, 16), b, np.uint8),
                np.full((8, 8), 70, np.uint8),
                np.full((8, 8), 70, np.uint8),
            )},
        )

    i0, y0 = idr(20)
    i1, y1 = idr(50)
    payload = mp4_mux_avc(
        [i0, patch(1, 1, 99), patch(2, 0, 88),
         i1, patch(1, 1, 77), patch(2, 0, 66)],
        dims=(16, 32), max_ref=1,
    )
    assert mp4_demux_avc(payload)["sync_samples"] == [0, 3]
    sync, y, cb, cr = mp4_decode_frame_seek(payload, 4)
    exp = y1.astype(np.int64).copy()
    exp[:, 16:] = 77
    assert sync == 3 and (y == exp).all()
    # frame 2 lives in GOP 0 and accumulates both patches
    sync0, y2, _, _ = mp4_decode_frame_seek(payload, 2)
    assert sync0 == 0 and (y2[:, :16] == 88).all() and (y2[:, 16:] == 99).all()

    # corrupt GOP 0's first P sample: GOP-1 seeks are untouched,
    # the sequential full decode is not
    ba = bytearray(payload)
    at = ba.find(bytes([99]) * 32)
    assert at > 0
    ba[at] ^= 0xFF
    sync, y, _, _ = mp4_decode_frame_seek(bytes(ba), 5)
    assert sync == 3 and (y[:, :16] == 66).all() and (y[:, 16:] == 77).all()
    # I_PCM carries no CRC, so the corruption decodes silently WRONG
    # in its own GOP (frame 1 diverges) — while the GOP-1 seek above
    # is bit-identical to the pristine decode
    bad1 = list(mp4_decode_ipcm_frames(bytes(ba)))[1][1]
    good1 = list(mp4_decode_ipcm_frames(payload))[1][1]
    assert (bad1 != good1).any()
    _, ybad, _, _ = mp4_decode_frame_seek(bytes(ba), 2)
    assert (ybad != y2).any()  # target in the bad GOP sees the flip
    with pytest.raises(ValueError, match="out of range"):
        mp4_decode_frame_seek(payload, 6)


def test_property_multislice_pcm_equals_single_slice():
    """Property (r12): for all-I_PCM content — where intra prediction
    plays no role — a picture split at ANY slice boundary decodes
    bit-identically to the unsplit picture, for every split point."""
    from pagerank_hadoop_spark.operators.h264 import (
        _h264_decode_picture,
        h264_encode_islice,
    )

    rng = np.random.default_rng(712)
    wmb, hmb = 3, 2
    mbs = []
    for _ in range(wmb * hmb):
        mbs.append(
            ("pcm", (
                rng.integers(0, 256, 256, dtype=np.uint8).tobytes(),
                rng.integers(0, 256, 64, dtype=np.uint8).tobytes(),
                rng.integers(0, 256, 64, dtype=np.uint8).tobytes(),
            ))
        )
    sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb))
    pps = h264_parse_pps(h264_pps_rbsp())
    whole = _h264_decode_picture(
        [h264_encode_islice(mbs, wmb)], sps, pps
    )
    for split in range(1, wmb * hmb):
        parts = [
            h264_encode_islice(mbs[:split], wmb, first_mb=0),
            h264_encode_islice(mbs[split:], wmb, first_mb=split),
        ]
        y, cb, cr = _h264_decode_picture(parts, sps, pps)
        assert (y == whole[0]).all()
        assert (cb == whole[1]).all() and (cr == whole[2]).all()
    # three-way split too
    y3, cb3, cr3 = _h264_decode_picture(
        [
            h264_encode_islice(mbs[:2], wmb, first_mb=0),
            h264_encode_islice(mbs[2:5], wmb, first_mb=2),
            h264_encode_islice(mbs[5:], wmb, first_mb=5),
        ],
        sps,
        pps,
    )
    assert (y3 == whole[0]).all()


def test_property_all_intra_p_slice_equals_i_slice():
    """Property (r12): a P slice whose every macroblock is intra
    decodes bit-identically to the I slice carrying the SAME spec
    list — the 5-offset changes the mb_type coding, not the layer
    semantics, and with zero skips the availability/mode grids evolve
    identically. Random mixes of pcm / i16 / i4 specs, several qps."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_islice,
        h264_encode_pskip,
    )

    rng = np.random.default_rng(888)
    wmb, hmb = 2, 2
    sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())
    ref = (
        np.full((hmb * 16, wmb * 16), 77, np.uint8),
        np.full((hmb * 8, wmb * 8), 88, np.uint8),
        np.full((hmb * 8, wmb * 8), 99, np.uint8),
    )
    for trial in range(8):
        qp = int(rng.integers(26, 46))
        mbs = []
        for mbi in range(wmb * hmb):
            kind = int(rng.integers(0, 3))
            mby, mbx = divmod(mbi, wmb)
            if kind == 0:
                mbs.append(("pcm", (
                    rng.integers(0, 256, 256, dtype=np.uint8).tobytes(),
                    rng.integers(0, 256, 64, dtype=np.uint8).tobytes(),
                    rng.integers(0, 256, 64, dtype=np.uint8).tobytes(),
                )))
            elif kind == 1:
                # legal modes only: V needs a top row, H a left column
                pred = int(rng.choice(
                    [2] + ([0] if mby else []) + ([1] if mbx else [])
                ))
                chroma = int(rng.choice(
                    [0] + ([2] if mby else []) + ([1] if mbx else [])
                ))
                mbs.append(("i16", pred, chroma,
                            int(rng.integers(-7, 8)), 0))
            else:
                mbs.append(("i4", 2, 0))  # DC everywhere: always legal
        i_nal = h264_encode_islice(mbs, wmb, qp=qp)
        p_nal = h264_encode_pskip(
            wmb, hmb, 1,
            {(mbi % wmb, mbi // wmb): mb for mbi, mb in enumerate(mbs)},
            qp=qp,
        )
        yi, cbi, cri = H._h264_decode_picture([i_nal], sps, pps)
        yp, cbp_, crp = H._h264_decode_picture([p_nal], sps, pps, ref)
        assert (yi == yp).all(), f"trial {trial} luma diverged"
        assert (cbi == cbp_).all() and (cri == crp).all()


def test_seek_ahash_matches_full_index(spark):
    """r12: the sampled perceptual key must equal the FULL index's
    key for the same frame — otherwise sampled keys could not
    bucket-join against the full index."""
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.h264 import (
        mp4_frame_ahash,
        mp4_seek_ahash,
    )
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    frames = _frames(3, 16, 32)
    df = spark.createDataFrame(
        [(7, bytearray(mp4_mux_avc(frames)))],
        "media_id long, payload binary",
    )
    media = attach_media(df, F.col("payload"), media_type="video/mp4")
    sampled = mp4_seek_ahash(media).collect()[0]
    # media_id 7 % 3 samples -> target 1; all-IDR stream: sync == 1
    assert sampled["target_idx"] == 1 and sampled["sync_idx"] == 1
    full = {
        r["frame_idx"]: r for r in mp4_frame_ahash(media).collect()
    }
    assert sampled["ahash"] == full[1]["ahash"]
    assert sampled["y_md5"] == full[1]["y_md5"]


# ---------------------------------------------------------------------------
# r13: P_L0_16x16 full-pel motion-vector decode
# ---------------------------------------------------------------------------


def _gather_clamped(plane, x0, y0, w, h):
    """Test-local reference gather with edge replication, written
    with np.take(mode='clip') so it is NOT the implementation's
    np.ix_ path."""
    rows = np.take(
        plane, np.arange(y0, y0 + h), axis=0, mode="clip"
    )
    return np.take(rows, np.arange(x0, x0 + w), axis=1, mode="clip")


def _ctx_with(wmb, hmb, entries):
    """Build a _MotionCtx from {(mbx, mby): 'I' | (mvx, mvy)} at MB
    granularity (test shorthand; partition tests write finer)."""
    import pagerank_hadoop_spark.operators.h264 as H

    ctx = H._MotionCtx(wmb, hmb)
    for (mbx, mby), v in entries.items():
        if v == "I":
            ctx.set_intra_mb(mbx, mby)
        else:
            ctx.set_inter(mbx * 4, mby * 4, 4, 4, v)
    return ctx


def test_mv_prediction_rules_hand_computed():
    """§8.4.1.3 unit cases, each checked against a HAND-computed
    value (the encoder and decoder share this helper, so a shared
    round-trip alone could not catch a wrong formula)."""
    wmb, hmb = 3, 2

    def pred16(entries, mbx, mby):
        return _ctx_with(wmb, hmb, entries).pred(mbx * 4, mby * 4, 4, 4, 0)

    # no neighbours at all: every input zeroed -> median (0,0)
    assert pred16({}, 0, 0) == (0, 0)
    # rule 1: B and C unavailable, A available -> mvA verbatim
    assert pred16({(0, 0): (8, 4)}, 1, 0) == (8, 4)
    # ...even when A is intra (rule 1 checks mbAddr availability;
    # the intra A contributes its zeroed vector)
    assert pred16({(0, 0): "I"}, 1, 0) == (0, 0)
    # rule 2: exactly one neighbour with refIdx 0 -> its vector
    # MB (1,1): A=(0,1) intra, B=(1,0) inter, C=(2,0) intra
    m = {(0, 0): (99, 99), (1, 0): (12, -8), (2, 0): "I", (0, 1): "I"}
    assert pred16(m, 1, 1) == (12, -8)
    # rule 3: median componentwise over three refIdx-0 neighbours
    m = {(0, 0): (99, 99), (1, 0): (8, 4), (2, 0): (16, -4), (0, 1): (4, 0)}
    assert pred16(m, 1, 1) == (8, 0)
    # C geometric fallback to D: MB (2,1) has mbx+1 == wmb, so C is
    # replaced by D=(1,0); A=(1,1)? no — A=(1,1) not set; use below:
    m = {(1, 0): (20, 8), (2, 0): (8, 4), (1, 1): (4, 0)}
    assert pred16(m, 2, 1) == (8, 4)

    def skip(entries, mbx, mby):
        return _ctx_with(wmb, hmb, entries).skip_mv(mbx, mby)

    # skip derivation: unavailable A or B forces zero
    assert skip({}, 1, 1) == (0, 0)  # neither decoded
    assert skip({(1, 0): (4, 4)}, 1, 1) == (0, 0)  # A missing
    # zero-vector refIdx-0 A forces zero even with a moving B
    assert skip({(1, 0): (4, 4), (0, 1): (0, 0)}, 1, 1) == (0, 0)
    # intra A does NOT force zero (refIdx -1): proceeds to median
    # A=(0,1) intra, B=(1,0) (4,8), C=(2,0) (12,16):
    # two refIdx-0 matches -> median((0,0),(4,8),(12,16)) = (4,8)
    assert skip(
        {(1, 0): (4, 8), (2, 0): (12, 16), (0, 1): "I"}, 1, 1
    ) == (4, 8)


def test_mv_prediction_directional_rules_hand_computed():
    """r13: the §8.4.1.3 DIRECTIONAL shortcuts for half-MB
    partitions, hand-computed — including the case an MB-granular
    motion map cannot represent (a bottom 16x8 partition whose B
    neighbour is the TOP partition of the SAME macroblock)."""
    import pagerank_hadoop_spark.operators.h264 as H

    wmb, hmb = 3, 2
    # 16x8 top partition takes B (the above MB's bottom row)
    ctx = _ctx_with(wmb, hmb, {(1, 0): (12, 4), (0, 1): (40, 40)})
    assert ctx.pred(4, 4, 4, 2, 0) == (12, 4)  # MB (1,1) top half
    # ...but falls to median when B is intra
    ctx = _ctx_with(
        wmb, hmb, {(1, 0): "I", (0, 1): (40, 40), (2, 0): (8, 0)}
    )
    # A=(40,40) r0, B intra(0,0) r-1, C=(2,0)->(8,0) r0: two matches
    # -> median((40,40),(0,0),(8,0)) = (8,0)
    assert ctx.pred(4, 4, 4, 2, 0) == (8, 0)
    # 16x8 bottom partition takes A; and with A present the SAME-MB
    # top partition is its B — the block-granular case
    ctx = _ctx_with(wmb, hmb, {(0, 1): (-8, 12), (1, 0): (1, 1)})
    ctx.set_inter(4, 4, 4, 2, (99, 99))  # top half of MB (1,1)
    assert ctx.pred(4, 6, 4, 2, 1) == (-8, 12)  # directional A
    # bottom 16x8 with INTRA A -> median reads the same-MB top half
    ctx = _ctx_with(wmb, hmb, {(0, 1): "I"})
    ctx.set_inter(4, 4, 4, 2, (16, -4))
    # A intra (0,0) r-1, B=(99?) no: B=(4,5)=top half (16,-4) r0,
    # C=(8,5) undecoded -> D=(3,5) left MB (intra, r-1):
    # exactly one refIdx-0 -> (16,-4)
    assert ctx.pred(4, 6, 4, 2, 1) == (16, -4)
    # 8x16 left partition takes A
    ctx = _ctx_with(wmb, hmb, {(0, 1): (20, 0), (1, 0): (1, 1)})
    assert ctx.pred(4, 4, 2, 4, 0) == (20, 0)
    # 8x16 right partition takes C (above-right MB's bottom row)
    ctx = _ctx_with(
        wmb, hmb, {(1, 0): (1, 1), (2, 0): (-4, 8), (0, 1): (2, 2)}
    )
    ctx.set_inter(4, 4, 2, 4, (50, 50))  # left half of MB (1,1)
    assert ctx.pred(6, 4, 2, 4, 1) == (-4, 8)
    # ...and C -> D substitution when above-right is unavailable:
    # MB (2,1) right half: C would be (12,3) out of picture -> D =
    # (9,3) inside MB (2,0)
    ctx = _ctx_with(wmb, hmb, {(2, 0): (24, -8), (1, 1): (1, 1)})
    ctx.set_inter(8, 4, 2, 4, (50, 50))  # left half of MB (2,1)
    assert ctx.pred(10, 4, 2, 4, 1) == (24, -8)


def test_pmv_integer_motion_roundtrip_luma_and_chroma():
    """Encode-decode round trip for planted integer motion vectors,
    verified against an INDEPENDENT clamped-gather + bilinear model:
    even vectors hit integer chroma positions, odd vectors hit the
    half-chroma-sample bilinear (§8.4.2.2.2), and vectors pointing
    outside the picture replicate edge samples (§8.4.2.2.1 Clip3)."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
    )

    rng = np.random.default_rng(13)
    wmb, hmb = 4, 3
    y0 = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())

    # one explicit MV per macroblock: mix of even/odd/negative pels
    # and a far vector that lands outside the picture
    pels = {
        (0, 0): (2, 0), (1, 0): (-3, 1), (2, 0): (0, -2), (3, 0): (7, 5),
        (0, 1): (-40, 0), (1, 1): (1, 1), (2, 1): (0, 0), (3, 1): (-1, -1),
        (0, 2): (6, -40), (1, 2): (4, 2), (2, 2): (-2, 3), (3, 2): (3, 3),
    }
    specs = {k: ("mv", 4 * dx, 4 * dy) for k, (dx, dy) in pels.items()}
    nal = h264_encode_pskip(wmb, hmb, 1, specs)
    y, cb, cr = H._h264_decode_picture([nal], sps, pps, (y0, cb0, cr0))

    for (mbx, mby), (dx, dy) in pels.items():
        got = y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
        exp = _gather_clamped(y0, mbx * 16 + dx, mby * 16 + dy, 16, 16)
        assert (got == exp).all(), f"luma MB ({mbx},{mby}) mv {dx},{dy}"
        # chroma: eighth-sample position 4*d & 7 -> frac 0 (even d)
        # or 4 (odd d); bilinear written independently here
        for p0, pd in ((cb0, cb), (cr0, cr)):
            cxi, cyi = (4 * dx) >> 3, (4 * dy) >> 3
            cxf, cyf = (4 * dx) & 7, (4 * dy) & 7
            a = _gather_clamped(
                p0, mbx * 8 + cxi, mby * 8 + cyi, 8, 8
            ).astype(np.int64)
            b = _gather_clamped(
                p0, mbx * 8 + cxi + 1, mby * 8 + cyi, 8, 8
            ).astype(np.int64)
            c = _gather_clamped(
                p0, mbx * 8 + cxi, mby * 8 + cyi + 1, 8, 8
            ).astype(np.int64)
            d = _gather_clamped(
                p0, mbx * 8 + cxi + 1, mby * 8 + cyi + 1, 8, 8
            ).astype(np.int64)
            expc = (
                (8 - cxf) * (8 - cyf) * a
                + cxf * (8 - cyf) * b
                + (8 - cxf) * cyf * c
                + cxf * cyf * d
                + 32
            ) >> 6
            gotc = pd[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
            assert (gotc == expc).all(), (
                f"chroma MB ({mbx},{mby}) mv {dx},{dy}"
            )


def test_pmv_skip_inheritance_and_explicit_zero_hold():
    """Skips AFTER an MV macroblock inherit its motion through the
    §8.4.1.1 derivation (they must explicitly motion-compensate, no
    longer a co-located no-op), while explicit ('mv', 0, 0) blocks —
    carrying a nonzero mvd against the moving prediction — hold the
    co-located content."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import h264_encode_pskip

    wmb, hmb = 4, 2
    rng = np.random.default_rng(7)
    y0 = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr0 = cb0[::-1].copy()
    sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())

    # row 0: all explicit (8,4)-pel MV; row 1: (0,1) explicit same
    # MV, (1,1) and (2,1) SKIPPED -> derived median is (32,16)
    # quarter-pel = (8,4) pels; (3,1) explicit zero MV (mvd != 0)
    mv = ("mv", 32, 16)
    specs = {(x, 0): mv for x in range(4)}
    specs[(0, 1)] = mv
    specs[(3, 1)] = ("mv", 0, 0)
    nal = h264_encode_pskip(wmb, hmb, 1, specs)
    y, cb, cr = H._h264_decode_picture([nal], sps, pps, (y0, cb0, cr0))

    for mbx, mby in [(1, 1), (2, 1)]:  # inherited skips
        got = y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
        exp = _gather_clamped(y0, mbx * 16 + 8, mby * 16 + 4, 16, 16)
        assert (got == exp).all(), f"skip MB ({mbx},{mby}) not shifted"
        gotc = cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8]
        expc = _gather_clamped(cb0, mbx * 8 + 4, mby * 8 + 2, 8, 8)
        assert (gotc == expc).all()
    # explicit zero-MV block stays co-located
    assert (y[16:32, 48:64] == y0[16:32, 48:64]).all()
    assert (cr[8:16, 24:32] == cr0[8:16, 24:32]).all()

    # control: with NO mv macroblock in the slice, an all-skip slice
    # still reproduces the reference exactly (pre-r13 behavior)
    nal0 = h264_encode_pskip(wmb, hmb, 2)
    y2, cb2, cr2 = H._h264_decode_picture(
        [nal0], sps, pps, (y0, cb0, cr0)
    )
    assert (y2 == y0).all() and (cb2 == cb0).all() and (cr2 == cr0).all()


def test_pmv_refusals_subpel_cbp_partitions_multiref():
    """Typed boundaries of the inter subset: nonzero inter
    coded_block_pattern (residual wall) and B-shaped sub_mb_types
    refuse with NotImplementedError naming the stage; fractional
    luma vectors DECODE as of r14 (checked here on a constant
    reference; the interpolation itself is pinned in
    test_subpel_interpolation_vs_scalar_model and the
    media_mp4_subpel oracle)."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        _BitWriter,
        _nal,
        h264_encode_pskip,
    )

    wmb, hmb = 2, 2
    ref = (
        np.full((32, 32), 77, np.uint8),
        np.full((16, 16), 88, np.uint8),
        np.full((16, 16), 99, np.uint8),
    )
    sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())

    # sub-pel luma vectors decode as of r14 (the six-tap refusal was
    # lifted — test_subpel_* pin the interpolation itself); on a
    # CONSTANT reference every quarter position equals the constant,
    # which isolates "it decodes" from "it interpolates correctly"
    nal = h264_encode_pskip(wmb, hmb, 1, {(0, 0): ("mv", 2, 0)})
    yd, _cb, _cr = H._h264_decode_picture([nal], sps, pps, ref)
    assert (yd == 77).all()
    nal = h264_encode_pskip(wmb, hmb, 1, {(0, 0): ("mv", 0, -1)})
    yd, _cb, _cr = H._h264_decode_picture([nal], sps, pps, ref)
    assert (yd == 77).all()

    def p_header(w):
        w.ue(0)  # first_mb_in_slice
        w.ue(5)  # slice_type P
        w.ue(0)  # pps id
        w.u(1, 4)  # frame_num

    # nonzero inter cbp: craft P_L0_16x16 with cbp codeNum 2
    w = _BitWriter()
    p_header(w)
    w.u(0, 1), w.u(0, 1), w.u(0, 1)  # no override/reorder/marking
    w.se(0)  # slice_qp_delta
    w.ue(0)  # mb_skip_run
    w.ue(0)  # mb_type P_L0_16x16
    w.se(4), w.se(0)  # integer mvd
    w.ue(2)  # coded_block_pattern codeNum 2 != 0
    with pytest.raises(NotImplementedError, match="inter coded_block_pattern"):
        H._h264_decode_picture([_nal(2, 1, w.rbsp_trailing())], sps, pps, ref)

    # r13: num_ref_idx_l0_active = 2 now PARSES (te(v) ref_idx); a
    # ref_idx pointing past the decoded DPB is malformed, not
    # unimplemented
    w = _BitWriter()
    p_header(w)
    w.u(1, 1)  # num_ref_idx_active_override_flag
    w.ue(1)  # num_ref_idx_l0_active_minus1 = 1 -> 2 refs
    w.u(0, 1), w.u(0, 1)  # no reorder / no adaptive marking
    w.se(0)
    w.ue(0)  # skip run
    w.ue(0)  # P_L0_16x16
    w.u(0, 1)  # te(v) ref_idx_l0 = 1 (inverted bit)
    w.se(4), w.se(0)  # integer mvd
    w.ue(0)  # cbp 0
    with pytest.raises(ValueError, match="beyond the 1-picture DPB"):
        H._h264_decode_picture([_nal(2, 1, w.rbsp_trailing())], sps, pps, ref)


def test_pmv_accumulates_across_frames_in_mp4():
    """End-to-end through the MP4 mux/demux: two P frames each
    shifting by (+4,0) pels compose — frame 2 shows the IDR content
    shifted by 8 columns (with left-edge replication), proving the
    motion-compensated picture (not the IDR) is the next reference."""
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_decode_ipcm_frames,
    )

    rng = np.random.default_rng(21)
    y0 = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    cbcr = rng.integers(0, 256, (8, 16)).astype(np.uint8)
    shift = {(x, 0): ("mv", 16, 0) for x in range(2)}  # +4 pels right
    nals = [
        h264_encode_ipcm(y0, cbcr, cbcr),
        h264_encode_pskip(2, 1, 1, shift),
        h264_encode_pskip(2, 1, 2, shift),
    ]
    payload = mp4_mux_avc(nals, dims=(16, 32), max_ref=1)
    frames = list(mp4_decode_ipcm_frames(payload))
    assert len(frames) == 3
    exp1 = _gather_clamped(y0, 4, 0, 32, 16)
    assert (frames[1][1] == exp1).all()
    exp2 = _gather_clamped(exp1, 4, 0, 32, 16)
    assert (frames[2][1] == exp2).all()
    # and the chroma double-shift (+2 chroma samples per frame)
    expc = _gather_clamped(_gather_clamped(cbcr, 2, 0, 16, 8), 2, 0, 16, 8)
    assert (frames[2][2] == expc).all()


def test_pmv_partition_roundtrip_16x8_8x16():
    """r13: encode-decode round trip for 16x8 and 8x16 partitioned
    motion, verified against the INDEPENDENT clamped-gather model —
    each half-MB shifts by its own vector (luma rects 16x8 / 8x16,
    chroma rects 8x4 / 4x8, bilinear on odd pels), and a trailing
    SKIP derives its vector from the partitioned neighbours via the
    16x16 median over the 4x4-block context."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import h264_encode_pskip

    rng = np.random.default_rng(31)
    wmb, hmb = 3, 2
    y0 = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())

    # MB(0,0): 16x8 with distinct top/bottom vectors (odd + even)
    # MB(1,0): 8x16 with distinct left/right vectors (one negative)
    # MB(2,0): whole-MB mv; MB(0,1): 16x8 again; MB(1,1)+(2,1): SKIP
    specs = {
        (0, 0): ("mv16x8", (12, 4), (8, -8)),    # pels (3,1) / (2,-2)
        (1, 0): ("mv8x16", (-4, 12), (20, 0)),   # pels (-1,3) / (5,0)
        (2, 0): ("mv", 8, 8),                    # pel (2,2)
        (0, 1): ("mv16x8", (8, 8), (8, 8)),      # pel (2,2) both
    }
    nal = h264_encode_pskip(wmb, hmb, 1, specs)
    y, cb, cr = H._h264_decode_picture([nal], sps, pps, (y0, cb0, cr0))

    def check_luma(x0, yy0, w, h, dx, dy):
        got = y[yy0 : yy0 + h, x0 : x0 + w]
        exp = _gather_clamped(y0, x0 + dx, yy0 + dy, w, h)
        assert (got == exp).all(), (x0, yy0, w, h, dx, dy)

    def check_chroma(cx0, cy0, w, h, mvx, mvy):
        cxi, cyi = mvx >> 3, mvy >> 3
        cxf, cyf = mvx & 7, mvy & 7
        for p0, pd in ((cb0, cb), (cr0, cr)):
            quads = [
                _gather_clamped(
                    p0, cx0 + cxi + qx, cy0 + cyi + qy, w, h
                ).astype(np.int64)
                for qy in (0, 1) for qx in (0, 1)
            ]
            exp = (
                (8 - cxf) * (8 - cyf) * quads[0]
                + cxf * (8 - cyf) * quads[1]
                + (8 - cxf) * cyf * quads[2]
                + cxf * cyf * quads[3]
                + 32
            ) >> 6
            got = pd[cy0 : cy0 + h, cx0 : cx0 + w]
            assert (got == exp).all(), (cx0, cy0, mvx, mvy)

    # MB(0,0) 16x8 halves
    check_luma(0, 0, 16, 8, 3, 1)
    check_luma(0, 8, 16, 8, 2, -2)
    check_chroma(0, 0, 8, 4, 12, 4)
    check_chroma(0, 4, 8, 4, 8, -8)
    # MB(1,0) 8x16 halves
    check_luma(16, 0, 8, 16, -1, 3)
    check_luma(24, 0, 8, 16, 5, 0)
    check_chroma(8, 0, 4, 8, -4, 12)
    check_chroma(12, 0, 4, 8, 20, 0)
    # MB(2,0) whole
    check_luma(32, 0, 16, 16, 2, 2)
    # MB(1,1) skip: A = MB(0,1) bottom-right block (8,8); B = MB(1,0)
    # left-half bottom block (-4,12): neither zero -> median of
    # A(8,8), B(-4,12), C=MB(2,0)(8,8) -> (8,8)
    check_luma(16, 16, 16, 16, 2, 2)
    check_chroma(8, 8, 8, 8, 8, 8)
    # MB(2,1) skip: A = MB(1,1) skip (8,8); B = MB(2,0) (8,8); C out
    # -> D = MB(1,0) right half (20,0): median((8,8),(8,8),(20,0))
    # = (8,8)
    check_luma(32, 16, 16, 16, 2, 2)


def test_pmv_p8x8_subpartition_roundtrip():
    """r13: P_8x8 round trip — all four Table 7-17 sub_mb_types in
    one macroblock (8x8 / 8x4 / 4x8 / 4x4, nine vectors), verified
    against the independent clamped-gather model per sub-partition
    rect, plus a skip whose median reads a 4x4 sub-partition vector
    through the block-granular context."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import h264_encode_pskip

    rng = np.random.default_rng(43)
    wmb, hmb = 2, 2
    y0 = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
    cb0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    cr0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
    sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb, (0, 0, 0, 0), 1))
    pps = h264_parse_pps(h264_pps_rbsp())

    # pels per sub-partition (mixed parity, signs, one far clamp)
    w = [(2, 1), (-3, 0), (1, -2), (0, 3), (40, 40),
         (2, -1), (-1, 1), (3, 2), (1, 1)]
    q = lambda p: (4 * p[0], 4 * p[1])
    specs = {
        (0, 0): ("mv8x8",
                 (0, [q(w[0])]),
                 (1, [q(w[1]), q(w[2])]),
                 (2, [q(w[3]), q(w[4])]),
                 (3, [q(w[5]), q(w[6]), q(w[7]), q(w[8])])),
        (1, 0): ("mv",) + q((2, 2)),
        (0, 1): ("mv",) + q((1, 2)),
        # (1,1) skipped: A=MB(0,1)=(1,2), B=MB(1,0)=(2,2), C out ->
        # D = MB(0,0) block (3,3) = w[8]=(1,1):
        # median((1,2),(2,2),(1,1)) = (1,2)
    }
    nal = h264_encode_pskip(wmb, hmb, 1, specs)
    y, cb, cr = H._h264_decode_picture([nal], sps, pps, (y0, cb0, cr0))

    def check(x0, yy0, wpx, hpx, dx, dy):
        got = y[yy0 : yy0 + hpx, x0 : x0 + wpx]
        exp = _gather_clamped(y0, x0 + dx, yy0 + dy, wpx, hpx)
        assert (got == exp).all(), (x0, yy0, wpx, hpx, dx, dy)
        # chroma (even-pel vectors check integer path; odd the
        # bilinear — reuse the frame-level formula for both)
        mvx, mvy = 4 * dx, 4 * dy
        cxi, cyi, cxf, cyf = mvx >> 3, mvy >> 3, mvx & 7, mvy & 7
        cx0, cy0, cw, ch = x0 // 2, yy0 // 2, wpx // 2, hpx // 2
        quads = [
            _gather_clamped(
                cb0, cx0 + cxi + qx, cy0 + cyi + qy, cw, ch
            ).astype(np.int64)
            for qy in (0, 1) for qx in (0, 1)
        ]
        expc = (
            (8 - cxf) * (8 - cyf) * quads[0]
            + cxf * (8 - cyf) * quads[1]
            + (8 - cxf) * cyf * quads[2]
            + cxf * cyf * quads[3]
            + 32
        ) >> 6
        assert (cb[cy0 : cy0 + ch, cx0 : cx0 + cw] == expc).all()

    # sub-MB 0: 8x8 at (0,0)
    check(0, 0, 8, 8, *w[0])
    # sub-MB 1: 8x4 halves at (8,0) / (8,4)
    check(8, 0, 8, 4, *w[1])
    check(8, 4, 8, 4, *w[2])
    # sub-MB 2: 4x8 halves at (0,8) / (4,8)
    check(0, 8, 4, 8, *w[3])
    check(4, 8, 4, 8, *w[4])
    # sub-MB 3: 4x4 quads at (8,8),(12,8),(8,12),(12,12)
    check(8, 8, 4, 4, *w[5])
    check(12, 8, 4, 4, *w[6])
    check(8, 12, 4, 4, *w[7])
    check(12, 12, 4, 4, *w[8])
    # whole-MB neighbours and the derived skip
    check(16, 0, 16, 16, 2, 2)
    check(0, 16, 16, 16, 1, 2)
    check(16, 16, 16, 16, 1, 2)  # skip median picked (1,2)


def test_motion_summary_kernel_and_tiebreak(spark):
    """r13: the motion-field summary kernel — block-kind counts per
    frame and the dominant-vector election, including the
    DETERMINISTIC tie-break (equal block counts -> smallest
    (mvx, mvy) lexicographically) and the static/pan/IDR split."""
    from pyspark.sql import functions as F

    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_motion_summary,
    )
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    y0 = np.full((32, 32), 60, np.uint8)
    c0 = np.full((16, 16), 90, np.uint8)
    # frame 1: exact 32/32 tie between (-8,4) and (8,4): two MBs each
    # (explicit zero MVs elsewhere would change counts — MB(0,1) and
    # MB(1,1) get the OTHER vector)
    f1 = {
        (0, 0): ("mv", 8, 4), (1, 0): ("mv", -8, 4),
        (0, 1): ("mv", -8, 4), (1, 1): ("mv", 8, 4),
    }
    payload = mp4_mux_avc(
        [
            h264_encode_ipcm(y0, c0, c0),
            h264_encode_pskip(2, 2, 1, f1),
            h264_encode_pskip(2, 2, 2),  # all-skip: zero field
        ],
        dims=(32, 32), max_ref=1,
    )
    df = spark.createDataFrame(
        [(5, bytearray(payload))], "media_id long, payload binary"
    )
    rows = {
        r["frame_idx"]: r
        for r in mp4_motion_summary(
            attach_media(df, F.col("payload"), media_type="video/mp4")
        ).collect()
    }
    assert rows[0]["is_p"] == 0 and rows[0]["intra_blocks"] == 64
    assert rows[0]["inter_blocks"] == 0 and rows[0]["dom_count"] == 0
    r1 = rows[1]
    assert r1["is_p"] == 1 and r1["inter_blocks"] == 64
    assert r1["zero_blocks"] == 0
    # 32/32 tie -> lexicographic winner (-8, 4)
    assert (r1["dom_mvx"], r1["dom_mvy"], r1["dom_count"]) == (-8, 4, 32)
    r2 = rows[2]
    assert r2["zero_blocks"] == 64 and r2["dom_count"] == 0
    assert (r2["dom_mvx"], r2["dom_mvy"]) == (0, 0)


def test_property_random_partition_grids_match_gather_model():
    """Property (r13, widened r14 to QUARTER-PEL): for pictures whose
    every macroblock is an EXPLICIT-MV partition (any of 16x16 /
    16x8 / 8x16 / P_8x8 with random sub_mb_types) with random
    quarter-pel vectors (any fractional class, any rect size down to
    4x4), the encode-decode round trip equals the independent
    per-rect scalar §8.4.2.2.1 model (_naive_qpel — integer vectors
    reduce it to the clamped gather) + the chroma bilinear model —
    prediction/mvd bookkeeping AND interpolation cancel exactly for
    EVERY partition geometry, or some rect's pixels diverge."""
    from hypothesis import given, settings, strategies as st

    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import h264_encode_pskip

    # raw QUARTER-pel components: integer part -6..6, any frac class
    pel = st.tuples(st.integers(-24, 24), st.integers(-24, 24))

    def q(p):
        return (p[0], p[1])

    sub = st.integers(0, 3).flatmap(
        lambda t: st.tuples(
            st.just(t),
            st.lists(pel, min_size=[1, 2, 2, 4][t],
                     max_size=[1, 2, 2, 4][t]),
        )
    )
    mbspec = st.one_of(
        pel.map(lambda p: ("mv",) + q(p)),
        st.tuples(pel, pel).map(
            lambda v: ("mv16x8", q(v[0]), q(v[1]))),
        st.tuples(pel, pel).map(
            lambda v: ("mv8x16", q(v[0]), q(v[1]))),
        st.tuples(sub, sub, sub, sub).map(
            lambda s: ("mv8x8",) + tuple(
                (t, [q(p) for p in vs]) for t, vs in s)),
    )

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(2, 3), st.integers(1, 3),
        st.lists(mbspec, min_size=9, max_size=9),
        st.integers(0, 2**31 - 1),
    )
    def run(wmb, hmb, specs, seed):
        rng = np.random.default_rng(seed)
        y0 = rng.integers(0, 256, (hmb * 16, wmb * 16)).astype(np.uint8)
        cb0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
        cr0 = rng.integers(0, 256, (hmb * 8, wmb * 8)).astype(np.uint8)
        sps = h264_parse_sps(h264_sps_rbsp(wmb, hmb, (0, 0, 0, 0), 1))
        pps = h264_parse_pps(h264_pps_rbsp())
        grid = {
            (mbx, mby): specs[(mby * wmb + mbx) % len(specs)]
            for mby in range(hmb) for mbx in range(wmb)
        }
        nal = h264_encode_pskip(wmb, hmb, 1, grid)
        y, cb, cr = H._h264_decode_picture(
            [nal], sps, pps, (y0, cb0, cr0)
        )

        def rects(spec, mbx, mby):
            x0, yy0 = mbx * 16, mby * 16
            if spec[0] == "mv":
                yield (x0, yy0, 16, 16, spec[1], spec[2])
            elif spec[0] == "mv16x8":
                yield (x0, yy0, 16, 8, *spec[1])
                yield (x0, yy0 + 8, 16, 8, *spec[2])
            elif spec[0] == "mv8x16":
                yield (x0, yy0, 8, 16, *spec[1])
                yield (x0 + 8, yy0, 8, 16, *spec[2])
            else:
                for s, (t, vs) in enumerate(spec[1:]):
                    sx0 = x0 + 8 * (s % 2)
                    sy0 = yy0 + 8 * (s // 2)
                    geo = {
                        0: [(0, 0, 8, 8)],
                        1: [(0, 0, 8, 4), (0, 4, 8, 4)],
                        2: [(0, 0, 4, 8), (4, 0, 4, 8)],
                        3: [(0, 0, 4, 4), (4, 0, 4, 4),
                            (0, 4, 4, 4), (4, 4, 4, 4)],
                    }[t]
                    for (ox, oy, w, h), v in zip(geo, vs):
                        yield (sx0 + ox, sy0 + oy, w, h, v[0], v[1])

        for (mbx, mby), spec in grid.items():
            for x0, yy0, w, h, mvx, mvy in rects(spec, mbx, mby):
                exp = _naive_qpel(y0, x0, yy0, w, h, mvx, mvy)
                assert (y[yy0:yy0 + h, x0:x0 + w] == exp).all()
                # chroma via the bilinear model
                cxi, cyi = mvx >> 3, mvy >> 3
                cxf, cyf = mvx & 7, mvy & 7
                cx0, cy0, cw, ch = x0 // 2, yy0 // 2, w // 2, h // 2
                for p0, pd in ((cb0, cb), (cr0, cr)):
                    quads = [
                        _gather_clamped(
                            p0, cx0 + cxi + qx, cy0 + cyi + qy, cw, ch
                        ).astype(np.int64)
                        for qy in (0, 1) for qx in (0, 1)
                    ]
                    expc = (
                        (8 - cxf) * (8 - cyf) * quads[0]
                        + cxf * (8 - cyf) * quads[1]
                        + (8 - cxf) * cyf * quads[2]
                        + cxf * cyf * quads[3]
                        + 32
                    ) >> 6
                    assert (pd[cy0:cy0 + ch, cx0:cx0 + cw] == expc).all()

    run()


def test_weighted_prediction_fade_and_pan():
    """r13: explicit weighted prediction — an all-skip weighted P
    slice applies the §8.4.2.3.2 affine to every co-located sample
    (fade), an MV macroblock weights the SHIFTED gather, chroma
    components carry independent weights, both logWD branches and
    both clip saturations fire, and an identity table collapses to
    the plain path (bit-exact repeat)."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_decode_ipcm_frames,
    )

    rng = np.random.default_rng(59)
    y0 = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    cb0 = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    cr0 = rng.integers(0, 256, (16, 16)).astype(np.uint8)

    def aff(x, wgt, off, ld):
        x = x.astype(np.int64)
        v = (((x * wgt + (1 << (ld - 1))) >> ld) + off) if ld >= 1 \
            else x * wgt + off
        return np.clip(v, 0, 255).astype(np.uint8)

    wA = dict(ld=5, lw=40, lo=5, cd=4, cbw=20, cbo=-3, crw=12, cro=7)
    wB = dict(ld=0, lw=1, lo=-60, cd=0, cbw=2, cbo=0, crw=1, cro=90)
    nals = [
        h264_encode_ipcm(y0, cb0, cr0),
        h264_encode_pskip(2, 2, 1, None, weights=wA),   # fade (clip hi)
        h264_encode_pskip(2, 2, 2, None, weights=wB),   # LWD=0 (clip lo)
        h264_encode_pskip(
            2, 2, 3, {(0, 0): ("mv", 8, 4)}, weights=wA
        ),                                              # pan + fade
        h264_encode_pskip(2, 2, 4, None, weights="identity"),
    ]
    payload = mp4_mux_avc(
        nals, dims=(32, 32), max_ref=1, weighted_pred=True
    )
    fr = list(mp4_decode_ipcm_frames(payload))
    assert len(fr) == 5
    e1y = aff(y0, 40, 5, 5)
    assert (fr[1][1] == e1y).all()
    assert (fr[1][2] == aff(cb0, 20, -3, 4)).all()
    assert (fr[1][3] == aff(cr0, 12, 7, 4)).all()
    assert (fr[1][1] == 255).any()  # x*40>>5+5 saturates for x>=200
    e2y = aff(e1y, 1, -60, 0)
    assert (fr[2][1] == e2y).all() and (fr[2][1] == 0).any()
    assert (fr[2][3] == aff(aff(cr0, 12, 7, 4), 1, 90, 0)).all()
    # frame 3: MB(0,0) weighted SHIFTED gather; skips weighted copy
    got3 = fr[3][1]
    exp_mb = aff(_gather_clamped(e2y, 2, 1, 16, 16), 40, 5, 5)
    assert (got3[0:16, 0:16] == exp_mb).all()
    assert (got3[16:32, :] == aff(e2y[16:32, :], 40, 5, 5)).all()
    # frame 4: identity table == exact repeat of frame 3
    assert (fr[4][1] == got3).all() and (fr[4][2] == fr[3][2]).all()

    # encoder validation
    with pytest.raises(ValueError, match="missing"):
        h264_encode_pskip(2, 2, 1, None, weights={"ld": 5})
    bad = dict(wA, lw=300)
    with pytest.raises(ValueError, match="-128..127"):
        h264_encode_pskip(2, 2, 1, None, weights=bad)
    # a string other than 'identity' must be rejected by name, not
    # iterated character-by-character into the per-reference branch
    with pytest.raises(ValueError, match="accepted forms"):
        h264_encode_pskip(2, 2, 1, None, weights="default")
    # a weighted slice under an UNWEIGHTED PPS misparses loudly (the
    # stray table bits corrupt the stream), never silently
    with pytest.raises((ValueError, NotImplementedError)):
        list(mp4_decode_ipcm_frames(mp4_mux_avc(
            nals, dims=(32, 32), max_ref=1, weighted_pred=False
        )))


def test_multiref_background_restore_and_dpb_rules():
    """r13: multi-reference prediction — a P frame reaches PAST the
    previous picture to the IDR (ref_idx 1, te(v) coded), the
    background-restoration shape a single-ref decoder cannot
    express; the sliding-window DPB caps at max_num_ref_frames; and
    an IDR flushes it."""
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_decode_ipcm_frames,
    )

    rng = np.random.default_rng(67)
    y0 = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    c0 = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    patch = (bytes([200]) * 256, bytes([90]) * 64, bytes([60]) * 64)
    nals = [
        h264_encode_ipcm(y0, c0, c0),
        # f1: occlude MB(0,0) with a PCM patch
        h264_encode_pskip(2, 2, 1, {(0, 0): ("pcm", patch)}),
        # f2: MB(0,0) restores the BACKGROUND from the IDR (ref 1,
        # shifted +1 pel right); MB(1,0) re-references f1 (ref 0)
        h264_encode_pskip(
            2, 2, 2,
            {(0, 0): ("mvref", 1, 4, 0), (1, 0): ("mvref", 0, 8, 0)},
            n_ref=2,
        ),
    ]
    payload = mp4_mux_avc(nals, dims=(32, 32), max_ref=2)
    fr = list(mp4_decode_ipcm_frames(payload))
    y1 = fr[1][1]
    assert (y1[0:16, 0:16] == 200).all()
    y2 = fr[2][1]
    # MB(0,0): gather from the IDR (NOT the patched f1) at +1 pel
    assert (y2[0:16, 0:16] == _gather_clamped(y0, 1, 0, 16, 16)).all()
    # MB(1,0): gather from f1 at +2 pels — reads the patch edge
    assert (y2[0:16, 16:32] == _gather_clamped(y1, 18, 0, 16, 16)).all()
    # skips (bottom row) stay co-located with f1
    assert (y2[16:32, :] == y1[16:32, :]).all()

    # DPB cap: with max_ref=1 in the SPS, the same ref-1 stream must
    # fail typed (the second reference was never retained)
    bad = mp4_mux_avc(nals, dims=(32, 32), max_ref=1)
    with pytest.raises(ValueError, match="beyond the 1-picture DPB"):
        list(mp4_decode_ipcm_frames(bad))

    # IDR flush: IDR, P, IDR, then ref-1 P -> only ONE ref since the
    # second IDR; must fail even with max_ref=2
    nals_flush = [
        h264_encode_ipcm(y0, c0, c0),
        h264_encode_pskip(2, 2, 1),
        h264_encode_ipcm(y0, c0, c0, idr_pic_id=1),
        h264_encode_pskip(2, 2, 1, {(0, 0): ("mvref", 1, 0, 0)}, n_ref=2),
    ]
    with pytest.raises(ValueError, match="beyond the 1-picture DPB"):
        list(mp4_decode_ipcm_frames(
            mp4_mux_avc(nals_flush, dims=(32, 32), max_ref=2)
        ))

    # encoder guard: ref_idx > 0 without n_ref
    with pytest.raises(ValueError, match="requires n_ref"):
        h264_encode_pskip(2, 2, 1, {(0, 0): ("mvref", 1, 0, 0)})


def _naive_qpel(plane, x0, y0, w, h, mvx, mvy):
    """Decoder-independent scalar §8.4.2.2.1/Table 8-12 model: every
    sample coordinate Clip3'd individually, six-tap halves computed
    per pixel from raw gathers, the center j from UNCLIPPED
    horizontal intermediates, quarter positions as upward-rounding
    averages. Deliberately shares no code with _luma_qpel_block."""

    def clip3(lo, hi, v):
        return max(lo, min(hi, v))

    def clip1(v):
        return clip3(0, 255, v)

    hh_, ww_ = plane.shape

    def S(x, yy):
        return int(plane[clip3(0, hh_ - 1, yy), clip3(0, ww_ - 1, x)])

    taps = (1, -5, 20, 20, -5, 1)
    xi, yi, fx, fy = mvx >> 2, mvy >> 2, mvx & 3, mvy & 3
    out = np.zeros((h, w), np.uint8)
    for r in range(h):
        for c in range(w):
            xb, yb = x0 + c + xi, y0 + r + yi

            def b1_at(dy):
                return sum(
                    t * S(xb + o - 2, yb + dy) for o, t in enumerate(taps)
                )

            def h1_at(dx):
                return sum(
                    t * S(xb + dx, yb + o - 2) for o, t in enumerate(taps)
                )

            G = S(xb, yb)
            H_ = S(xb + 1, yb)
            M = S(xb, yb + 1)
            b = clip1((b1_at(0) + 16) >> 5)
            s = clip1((b1_at(1) + 16) >> 5)
            hv = clip1((h1_at(0) + 16) >> 5)
            m = clip1((h1_at(1) + 16) >> 5)
            j1 = sum(t * b1_at(o - 2) for o, t in enumerate(taps))
            j = clip1((j1 + 512) >> 10)
            tab = {
                (0, 0): G,
                (1, 0): (G + b + 1) >> 1,
                (2, 0): b,
                (3, 0): (H_ + b + 1) >> 1,
                (0, 1): (G + hv + 1) >> 1,
                (1, 1): (b + hv + 1) >> 1,
                (2, 1): (b + j + 1) >> 1,
                (3, 1): (b + m + 1) >> 1,
                (0, 2): hv,
                (1, 2): (hv + j + 1) >> 1,
                (2, 2): j,
                (3, 2): (j + m + 1) >> 1,
                (0, 3): (M + hv + 1) >> 1,
                (1, 3): (hv + s + 1) >> 1,
                (2, 3): (j + s + 1) >> 1,
                (3, 3): (m + s + 1) >> 1,
            }
            out[r, c] = tab[(fx, fy)]
    return out


def test_subpel_interpolation_vs_scalar_model():
    """r14 property gate: the vectorized quarter-pel interpolator
    equals the independent scalar spec model on random content for
    ALL 16 fractional classes, including vectors far outside the
    picture (whole-window edge replication)."""
    import pagerank_hadoop_spark.operators.h264 as H

    rng = np.random.default_rng(14)
    plane = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    for fx in range(4):
        for fy in range(4):
            for (xi, yi) in [(0, 0), (-3, 2), (5, -4), (-50, 60)]:
                mvx, mvy = 4 * xi + fx, 4 * yi + fy
                got = H._luma_qpel_block(plane, 8, 8, 16, 16, mvx, mvy)
                want = _naive_qpel(plane, 8, 8, 16, 16, mvx, mvy)
                assert (got == want).all(), (fx, fy, xi, yi)


def test_subpel_end_to_end_decode():
    """r14: encode a P frame whose four macroblocks carry vectors in
    four DIFFERENT fractional classes (pure-horizontal half,
    pure-vertical half, center j, diagonal quarter), decode the
    stream, and compare each 16x16 luma region against the scalar
    model; chroma must match the eighth-sample bilinear at the
    sub-pel-induced fractions."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_mux_avc,
    )

    rng = np.random.default_rng(41)
    y0 = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    cb0 = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    cr0 = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    mvs = {
        (0, 0): ("mv", 4 * 1 + 2, 4 * -2 + 0),   # (2,0): half b
        (1, 0): ("mv", 4 * -1 + 0, 4 * 1 + 2),   # (0,2): half h
        (0, 1): ("mv", 4 * 2 + 2, 4 * 0 + 2),    # (2,2): center j
        (1, 1): ("mv", 4 * 0 + 3, 4 * -1 + 1),   # (3,1): quarter g
    }
    payload = mp4_mux_avc(
        [
            h264_encode_ipcm(y0, cb0, cr0),
            h264_encode_pskip(2, 2, 1, mvs),
        ],
        dims=(32, 32),
        max_ref=1,
    )
    frames = list(H.mp4_decode_ipcm_frames(bytes(payload)))
    _, y1, cb1, cr1 = frames[1]
    for (mbx, mby), (_, mvx, mvy) in mvs.items():
        want = _naive_qpel(y0, mbx * 16, mby * 16, 16, 16, mvx, mvy)
        got = y1[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16]
        assert (got == want).all(), (mbx, mby)
        # chroma: eighth-sample bilinear replay per region
        cxi, cyi = mvx >> 3, mvy >> 3
        cxf, cyf = mvx & 7, mvy & 7
        for ref, dec in ((cb0, cb1), (cr0, cr1)):
            for rr in range(8):
                for cc in range(8):
                    px, py = mbx * 8 + cc, mby * 8 + rr

                    def cs(x, yy):
                        return int(
                            ref[max(0, min(15, yy)), max(0, min(15, x))]
                        )

                    a = cs(px + cxi, py + cyi)
                    b_ = cs(px + cxi + 1, py + cyi)
                    c_ = cs(px + cxi, py + cyi + 1)
                    d = cs(px + cxi + 1, py + cyi + 1)
                    want_c = (
                        (8 - cxf) * (8 - cyf) * a
                        + cxf * (8 - cyf) * b_
                        + (8 - cxf) * cyf * c_
                        + cxf * cyf * d
                        + 32
                    ) >> 6
                    assert int(dec[py, px]) == want_c, (mbx, mby, rr, cc)


def test_weighted_multiref_per_ref_selection():
    """r14: the pred_weight_table's per-reference shape — a fade
    against one reference composes with an identity gather from the
    other in the same slice; skips under a weighted ref-0 entry are
    weighted re-copies, under an identity ref-0 entry true no-ops;
    encoder guards pin the list contract."""
    import pagerank_hadoop_spark.operators.h264 as H
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_decode_ipcm_frames,
        mp4_mux_avc,
    )

    y0 = np.fromfunction(
        lambda r, c: (30 + 2 * c + 3 * r) % 200, (32, 32)
    ).astype(np.uint8)
    cb0 = np.fromfunction(lambda r, c: 40 + c + r, (16, 16)).astype(np.uint8)
    cr0 = np.fromfunction(lambda r, c: 50 + c + r, (16, 16)).astype(np.uint8)
    patch = (bytes([200]) * 256, bytes([90]) * 64, bytes([80]) * 64)
    wf = {"ld": 5, "lw": 20, "lo": 4,
          "cd": 5, "cbw": 28, "cbo": 2, "crw": 30, "cro": -3}

    def decode(weights):
        nals = [
            h264_encode_ipcm(y0, cb0, cr0),
            h264_encode_pskip(
                2, 2, 1, {(1, 1): ("pcm", patch)}, weights="identity"
            ),
            h264_encode_pskip(
                2, 2, 2,
                {(0, 0): ("mvref", 1, 4, -4), (1, 0): ("mvref", 0, -4, 8)},
                n_ref=2, weights=weights,
            ),
        ]
        payload = mp4_mux_avc(
            nals, dims=(32, 32), max_ref=2, weighted_pred=True
        )
        frames = list(mp4_decode_ipcm_frames(bytes(payload)))
        return frames[1][1], frames[2][1]  # y1, y2

    def gather(plane, dx, dy, x0, yy0):
        out = np.empty((16, 16), np.int64)
        for r in range(16):
            for c in range(16):
                out[r, c] = plane[
                    max(0, min(31, yy0 + r + dy)), max(0, min(31, x0 + c + dx))
                ]
        return out

    def wsamp(v, w, o, ld):
        return np.clip(((v * w + (1 << (ld - 1))) >> ld) + o, 0, 255)

    # fade on ref 0 (the patched frame): restore identity, gather faded,
    # skips WEIGHTED re-copies
    y1, y2 = decode([wf, None])
    assert (y2[:16, :16] == gather(y0.astype(np.int64), 1, -1, 0, 0)).all()
    assert (
        y2[:16, 16:] == wsamp(gather(y1.astype(np.int64), -1, 2, 16, 0),
                              20, 4, 5)
    ).all()
    assert (y2[16:, :] == wsamp(y1[16:, :].astype(np.int64), 20, 4, 5)).all()

    # flip: fade on ref 1 (the IDR background), identity recent ref —
    # skips are TRUE no-ops (co-located copy)
    y1b, y2b = decode([None, wf])
    assert (
        y2b[:16, :16] == wsamp(gather(y0.astype(np.int64), 1, -1, 0, 0),
                               20, 4, 5)
    ).all()
    assert (y2b[:16, 16:] == gather(y1b.astype(np.int64), -1, 2, 16, 0)).all()
    assert (y2b[16:, :] == y1b[16:, :]).all()

    # encoder guards: dict with n_ref > 1; wrong list length;
    # mismatched denoms across entries
    with pytest.raises(ValueError, match="per-reference weights LIST"):
        h264_encode_pskip(
            2, 2, 2, {(0, 0): ("mvref", 1, 0, 0)}, n_ref=2, weights=wf
        )
    with pytest.raises(ValueError, match="entries for"):
        h264_encode_pskip(
            2, 2, 2, {(0, 0): ("mv", 0, 0)}, n_ref=2, weights=[wf]
        )
    wf2 = dict(wf, ld=3)
    with pytest.raises(ValueError, match="one ld/cd denom pair"):
        h264_encode_pskip(
            2, 2, 2, {(0, 0): ("mv", 0, 0)}, n_ref=2, weights=[wf, wf2]
        )
