"""End-to-end CLI test: the reference's `hadoop jar <in> <out>` shape
(`python -m pagerank_hadoop_spark <in> <out>`) on a synthetic dump."""

from __future__ import annotations

import glob
import os

from pagerank_hadoop_spark.__main__ import main


def _page(title: str, body: str) -> str:
    return (
        f"<page><title>{title}</title><revision>"
        f"<text>{body}</text></revision></page>"
    )


def test_cli_writes_ordered_snapshots(spark, tmp_path):
    dump = tmp_path / "dump"
    dump.mkdir()
    # absorbing star: everybody (incl. Hub itself) links to Hub, so the
    # hub's rank is stable across iterations (a Hub→A edge instead
    # would 2-cycle the mass and drop both below the cut at iter 8).
    # With 8 vertices rank(Hub) ≈ 0.86 > 5/8, the only survivor.
    spokes = "".join(
        _page(f"S{i}", "[[Hub]] junk [[Missing Page]]") for i in range(6)
    )
    (dump / "part0.xml").write_text(
        _page("Hub", "[[Hub]]")
        + _page("A", "[[Hub]] [[Image:x]] [[bad{link}]]")
        + spokes
    )
    out = tmp_path / "result"
    assert main([str(dump), str(out)]) == 0

    for snap in ("PageRank.iter1.out", "PageRank.iter8.out"):
        files = glob.glob(os.path.join(out, snap, "part-*.csv"))
        assert files, f"missing TSV snapshot {snap}"
        rows = [
            line.split("\t")
            for f in files
            for line in open(f).read().splitlines()
        ]
        ranks = [float(r) for _, r in rows]
        assert ranks == sorted(ranks, reverse=True)
        assert rows[0][0] == "Hub"  # the only page above 5/N, or at least top
    pq = spark.read.parquet(str(out / "pagerank_iter8.parquet"))
    assert pq.columns == ["id", "rank"]


def test_registry_rotation_prefers_unchecked_oracle_backed(tmp_path):
    """The driver records only the first 50 registry entries, so
    queries() must order: never-hash-checked oracle-backed first,
    already-checked oracle-backed by LAST-green round ascending
    (stalest verification first — the r7 re-verification cycle),
    rows-only last — and rotate as new CORRECTNESS_r*.json rounds
    land."""
    import json

    from pagerank_hadoop_spark import queries as Q

    names = list(Q.queries())
    oracles = Q.oracle_sql()
    done = Q._driver_checked_names()
    ranks = [
        2 if n not in oracles else (1 if n in done else 0) for n in names
    ]
    assert ranks == sorted(ranks), "registry must be grouped 0<1<2"
    last_rounds = [done[n] for n in names if n in oracles and n in done]
    assert last_rounds == sorted(
        last_rounds
    ), "checked queries must cycle stalest-green first"

    # simulate a new round's record: its hash-matched names must map to
    # that round; failures never count as checked
    some = [n for n in names if n in oracles][:3]
    rec = {n: {"hash_match": True, "rows_match": True} for n in some}
    rec["failed_one"] = {"hash_match": False}
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rec))
    got = Q._driver_checked_names(root=str(tmp_path))
    assert got == {n: 99 for n in some}

    # a LATER green supersedes an earlier one (max round wins)
    (tmp_path / "CORRECTNESS_r100.json").write_text(
        json.dumps({some[0]: {"hash_match": True}})
    )
    got = Q._driver_checked_names(root=str(tmp_path))
    assert got[some[0]] == 100 and got[some[1]] == 99

    # corrupt file is skipped, not fatal
    (tmp_path / "CORRECTNESS_r98.json").write_text("{not json")
    assert Q._driver_checked_names(root=str(tmp_path))[some[0]] == 100


def test_cli_run_and_list(capsys):
    from pagerank_hadoop_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pagerank_topk" in out and "oracle" in out

    assert main(["run", "nonexistent_query"]) == 2
    assert main(["run"]) == 2
    # `-o` with no operand is a usage error (exit 2), not an IndexError
    assert main(["run", "topk_orders", "-o"]) == 2
    assert "requires an output path" in capsys.readouterr().err
    assert main(["run", "topk_orders", "/root/testdata/sf0.001"]) == 0
    assert "o_orderkey" in capsys.readouterr().out
