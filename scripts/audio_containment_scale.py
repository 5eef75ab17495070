"""Decade scaling attribution for audio_containment_screen (r13):
the screen's three stages — corpus phase-0 fingerprinting, clip-side
8-phase sweep, broadcast join + group — timed at the fixture corpus
(120 FLAC files) and a 10x corpus (1200 files, same per-key content
formulas over the wider key range), CLIPS HELD FIXED (the 30
benchmark clips; excerpts keep sourcing the base-range files so the
plant set is identical). Predictions under the screen asymmetry:
corpus stage linear, clip stage FLAT (it never sees the corpus),
join linear in corpus windows.

Usage: python scripts/audio_containment_scale.py
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

from pagerank_hadoop_spark.session import get_spark  # noqa: E402


def corpus_pcm(k: int):
    total = 512 * (2 + k % 3) + k % 9
    i = np.arange(total, dtype=np.int64)
    return ((17 + 2 * (k % 11)) * i + 5 * k) % 2000 - 1000


def build(spark, n_corpus: int):
    from pagerank_hadoop_spark.operators.flac import flac_encode

    def clip_pcm(b: int):
        if b >= 24:
            i = np.arange(1024, dtype=np.int64)
            return (29 * i + 11 * b) % 1800 - 900
        k0 = 3 * (b % 38) + 2
        o = 64 * (1 + b % 6)
        x = corpus_pcm(k0)[o : o + 1024 + 64 * (b % 5)].copy()
        if b % 4 == 0:
            x[600] += 1
        return x

    def enc(x, k):
        return bytearray(
            flac_encode(x[:, None], 8000 + k % 1000, 16, block_size=256,
                        fixed_order=k % 5, partition_order=k % 3)
        )

    corpus = spark.createDataFrame(
        [(k, enc(corpus_pcm(k), k)) for k in range(n_corpus)],
        "media_id long, payload binary",
    )
    clips = spark.createDataFrame(
        [(1000 + b, enc(clip_pcm(b), b)) for b in range(30)],
        "media_id long, payload binary",
    )
    return corpus, clips


def run(spark, n_corpus: int, label: str):
    from pagerank_hadoop_spark.operators.flac import (
        flac_phase_fingerprints,
        flac_window_fingerprint,
    )
    from pagerank_hadoop_spark.operators.multimodal import attach_media

    corpus, clips = build(spark, n_corpus)
    rows = []
    t0 = time.monotonic()
    corpus_fp = flac_window_fingerprint(
        attach_media(corpus, F.col("payload"), media_type="audio/flac")
    ).localCheckpoint(eager=True)
    n_cw = corpus_fp.count()
    rows.append(dict(scale=label, stage="corpus_fp",
                     wall=round(time.monotonic() - t0, 3),
                     corpus_files=n_corpus, corpus_windows=n_cw))
    t0 = time.monotonic()
    clip_fp = flac_phase_fingerprints(
        attach_media(clips, F.col("payload"), media_type="audio/flac"),
        phase_step=64,
    ).localCheckpoint(eager=True)
    n_kw = clip_fp.count()
    rows.append(dict(scale=label, stage="clip_sweep",
                     wall=round(time.monotonic() - t0, 3),
                     clip_windows=n_kw))
    t0 = time.monotonic()
    shash = clip_fp.select(
        F.col("media_id").alias("bench_id"), "fp",
        F.col("pcm_md5").alias("clip_md5"),
    )
    out = (
        corpus_fp.join(F.broadcast(shash), "fp")
        .groupBy("bench_id", "media_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    n_pairs = out.count()
    rows.append(dict(scale=label, stage="join_group",
                     wall=round(time.monotonic() - t0, 3),
                     matched_pairs=n_pairs))
    return rows


def main() -> None:
    spark = get_spark("audio-containment-scale")
    run(spark, 120, "warmup")
    out = []
    for n, label in ((120, "base_120"), (1200, "x10_1200")):
        out.extend(run(spark, n, label))
    for r in out:
        print(json.dumps(r))
    by = {(r["scale"], r["stage"]): r for r in out}
    print(json.dumps({
        "metric": "audio_containment_decade_growth",
        "stage_growth": {
            s: round(by[("x10_1200", s)]["wall"]
                     / max(by[("base_120", s)]["wall"], 1e-9), 2)
            for s in ("corpus_fp", "clip_sweep", "join_group")
        },
        "pair_growth": round(
            by[("x10_1200", "join_group")]["matched_pairs"]
            / max(by[("base_120", "join_group")]["matched_pairs"], 1), 2),
    }))


if __name__ == "__main__":
    main()
