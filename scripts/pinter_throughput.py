"""Single-core decode throughput for the H.264 paths (SCALE.md rows).

Measures decoded-luma MB/s per core on driver-built fixtures, one
decode stream at a time (no Spark): the vectorized I_PCM path (the
r9 baseline, 491 MB/s/core when measured), integer-pel P (pmv-style
explicit vectors + skips), and quarter-pel P (the r14 six-tap path,
every MB at a fractional position — the worst case). The P numbers
carry the per-MB Python parse loop (sequential bitstream state, like
FLAC's LPC) plus the per-block NumPy compensation; the gap between
them and I_PCM is the honest cost of that loop, reported rather than
hidden.

Usage: python scripts/pinter_throughput.py [n_frames]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_hadoop_spark.operators.h264 import (  # noqa: E402
    h264_encode_ipcm,
    h264_encode_pskip,
    mp4_decode_ipcm_frames,
    mp4_mux_avc,
)


def build(kind: str, n_frames: int, wmb: int = 8, hmb: int = 8) -> bytes:
    """One MP4: an IDR I_PCM frame then n_frames-1 P frames of the
    requested kind over a (wmb*16 x hmb*16) picture."""
    w, h = wmb * 16, hmb * 16
    i = np.arange(w * h, dtype=np.int64)
    y0 = ((37 * i * i + 11 * i) % 236 + 10).reshape(h, w).astype(np.uint8)
    cb0 = np.full((h // 2, w // 2), 60, np.uint8)
    cr0 = np.full((h // 2, w // 2), 70, np.uint8)
    nals = [h264_encode_ipcm(y0, cb0, cr0)]
    for f in range(1, n_frames):
        if kind == "ipcm":
            nals.append(h264_encode_ipcm(y0, cb0, cr0))
        else:
            mvs = {}
            for mby in range(hmb):
                for mbx in range(wmb):
                    if kind == "int":
                        mv = (4 * ((mbx + f) % 5 - 2), 4 * ((mby + f) % 3 - 1))
                    else:  # subpel: every MB fractional
                        mv = (
                            4 * ((mbx + f) % 5 - 2) + 1 + (mbx + f) % 3,
                            4 * ((mby + f) % 3 - 1) + 1 + (mby + mbx) % 3,
                        )
                    mvs[(mbx, mby)] = ("mv", mv[0], mv[1])
            nals.append(h264_encode_pskip(wmb, hmb, f, mvs))
    return mp4_mux_avc(nals, dims=(w, h), max_ref=1)


def measure(kind: str, n_frames: int) -> tuple[float, float]:
    payload = build("ipcm" if kind == "ipcm" else kind, n_frames)
    # warm-up decode (imports, allocator)
    for _ in mp4_decode_ipcm_frames(bytes(payload)):
        pass
    t0 = time.perf_counter()
    luma_bytes = 0
    for _idx, y, _cb, _cr in mp4_decode_ipcm_frames(bytes(payload)):
        luma_bytes += y.size
    dt = time.perf_counter() - t0
    return luma_bytes / dt / 1e6, dt


def main() -> None:
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    for kind, label in (
        ("ipcm", "I_PCM (vectorized raw-macroblock path)"),
        ("int", "P inter, integer-pel (per-MB parse + block gather)"),
        ("subpel", "P inter, quarter-pel (per-MB parse + six-tap window)"),
    ):
        mbs, dt = measure(kind, n_frames)
        print(f"{kind:7s} {mbs:8.1f} MB/s/core  ({n_frames} frames, {dt:.2f}s)  {label}")


if __name__ == "__main__":
    main()
