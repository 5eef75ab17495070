"""Decade scaling attribution for video_containment_screen (r14):
the screen's three stages — corpus decode+hash+shingle (the one
expensive pass: every frame is motion-compensated decode output),
clip-side shingling (fixed-size benchmark), broadcast join + group —
timed at the fixture corpus (60 videos) and a 10x corpus (600
videos, same per-key content formulas over the wider key range),
CLIPS HELD FIXED (the 30 clips keep sourcing base-range videos so
the plant set is identical). Predictions under the screen asymmetry:
corpus stage linear in corpus frames, clip stage FLAT (it never sees
the corpus), join linear in corpus shingles.

Usage: python scripts/video_containment_scale.py
Prints one JSON line per (scale, stage) cell plus a summary row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from pagerank_hadoop_spark.session import get_spark  # noqa: E402


def quad(key):
    i = np.arange(1024, dtype=np.int64)
    return (
        (20 + key % 60 + 37 * i * i + 11 * i) % 236 + 10
    ).reshape(32, 32).astype(np.uint8)


def corpus_frames(k):
    nf = 8 + k % 5
    dx, dy = 1 + k % 3, (k % 5) - 2
    y = quad(k)
    out = [y]
    for _ in range(nf - 1):
        rows = np.clip(np.arange(dy, dy + 32), 0, 31)
        cols = np.clip(np.arange(dx, dx + 32), 0, 31)
        y = y[np.ix_(rows, cols)].copy()
        out.append(y)
    return out, dx, dy


def build(spark, n_corpus: int):
    from pagerank_hadoop_spark.operators.h264 import (
        h264_encode_ipcm,
        h264_encode_pskip,
        mp4_mux_avc,
    )

    corp = []
    for k in range(n_corpus):
        frames, dx, dy = corpus_frames(k)
        u0 = np.full((16, 16), 15 + k % 50, np.uint8)
        v0 = np.full((16, 16), 9 + k % 40, np.uint8)
        allmv = {
            (x, yy): ("mv", 4 * dx, 4 * dy)
            for x in range(2) for yy in range(2)
        }
        nals = [h264_encode_ipcm(frames[0], u0, v0)]
        for f in range(1, len(frames)):
            nals.append(h264_encode_pskip(2, 2, f, allmv))
        corp.append((k, bytearray(mp4_mux_avc(nals, dims=(32, 32), max_ref=1))))

    clips = []
    for b in range(30):
        if b >= 24:
            planes = []
            for j in range(3):
                i = np.arange(1024, dtype=np.int64)
                planes.append(
                    ((20 + (4 * b + j) % 60 + 53 * i * i + 17 * i) % 236 + 10)
                    .reshape(32, 32).astype(np.uint8)
                )
        else:
            k0 = 2 * (b % 25) + 3
            o = 1 + b % 3
            length = 3 + (b // 3) % 3
            frames, _, _ = corpus_frames(k0)
            planes = [frames[o + j].copy() for j in range(length)]
            if b % 4 == 0:
                f = planes[1].reshape(-1)
                f[600] = f[600] + 1
        u = np.full((16, 16), 70, np.uint8)
        v = np.full((16, 16), 80, np.uint8)
        nals = [h264_encode_ipcm(y, u, v) for y in planes]
        clips.append(
            (1000 + b, bytearray(mp4_mux_avc(nals, dims=(32, 32), max_ref=1)))
        )
    return (
        spark.createDataFrame(corp, "media_id long, payload binary"),
        spark.createDataFrame(clips, "media_id long, payload binary"),
    )


def shingled(df, idcol):
    from pagerank_hadoop_spark.operators.h264 import mp4_frame_ahash
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    return (
        mp4_frame_ahash(
            attach_media(df, F.col("payload"), media_type="video/mp4")
        )
        .select(
            "media_id",
            F.concat_ws(
                "|", F.col("ahash"),
                F.lead("ahash", 1).over(w), F.lead("ahash", 2).over(w),
            ).alias("shingle"),
            F.concat_ws(
                "|", F.col("y_md5"),
                F.lead("y_md5", 1).over(w), F.lead("y_md5", 2).over(w),
            ).alias("exact_key"),
            F.lead("ahash", 2).over(w).alias("_h2"),
        )
        .where(F.col("_h2").isNotNull())
        .select(F.col("media_id").alias(idcol), "shingle", "exact_key")
    )


def run(spark, n_corpus: int, label: str):
    corpus, clips = build(spark, n_corpus)
    rows = []
    t0 = time.monotonic()
    corp_sh = shingled(corpus, "media_id").localCheckpoint(eager=True)
    n_cs = corp_sh.count()
    rows.append(dict(scale=label, stage="corpus_shingle",
                     wall=round(time.monotonic() - t0, 3),
                     corpus_videos=n_corpus, corpus_shingles=n_cs))
    t0 = time.monotonic()
    clip_sh = (
        shingled(clips, "clip_id")
        .withColumnRenamed("exact_key", "clip_exact")
        .localCheckpoint(eager=True)
    )
    n_ks = clip_sh.count()
    rows.append(dict(scale=label, stage="clip_shingle",
                     wall=round(time.monotonic() - t0, 3),
                     clip_shingles=n_ks))
    t0 = time.monotonic()
    out = (
        corp_sh.join(F.broadcast(clip_sh), "shingle")
        .groupBy("clip_id", "media_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    n_pairs = out.count()
    rows.append(dict(scale=label, stage="join_group",
                     wall=round(time.monotonic() - t0, 3),
                     matched_pairs=n_pairs))
    return rows


def main() -> None:
    spark = get_spark("video-containment-scale")
    run(spark, 60, "warmup")
    out = []
    for n, label in ((60, "base_60"), (600, "x10_600")):
        out.extend(run(spark, n, label))
    for r in out:
        print(json.dumps(r))
    by = {(r["scale"], r["stage"]): r for r in out}
    print(json.dumps({
        "metric": "video_containment_decade_growth",
        "stage_growth": {
            s: round(by[("x10_600", s)]["wall"]
                     / max(by[("base_60", s)]["wall"], 1e-9), 2)
            for s in ("corpus_shingle", "clip_shingle", "join_group")
        },
        "pair_growth": round(
            by[("x10_600", "join_group")]["matched_pairs"]
            / max(by[("base_60", "join_group")]["matched_pairs"], 1), 2),
    }))


if __name__ == "__main__":
    main()
