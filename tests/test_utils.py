"""Aux subsystem tests: stats, containers, GFF3, GFA, tables, visualizer."""

import json
import urllib.request

import numpy as np

from corticall_tpu import fixtures, visualizer as viz
from corticall_tpu.io import gfa as gfaio, gff as gffio, table as tblio
from corticall_tpu.utils import containers as ct, statistics as st
from corticall_tpu.traversal import TraversalConfig, TraversalEngine
from corticall_tpu.traversal.stopping import ContigStopper


def test_statistics_on_stream():
    s = st.StatisticsOnStream()
    xs = [2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0]
    for x in xs:
        s.push(x)
    assert s.n == 8
    assert abs(s.mean() - 5.0) < 1e-12
    assert abs(s.variance() - np.var(xs, ddof=1)) < 1e-12


def test_empirical_distribution():
    rng = np.random.default_rng(0)
    d = st.EmpiricalDistribution([0, 0, 1, 1], rng)
    draws = [d.draw() for _ in range(200)]
    assert set(draws) <= {2, 3}


def test_n50():
    assert st.n50([2, 2, 2, 3, 3, 4, 8, 8]) == 8
    assert st.n50([10]) == 10


def test_pca_identifies_variance_axis():
    rng = np.random.default_rng(1)
    t = rng.normal(size=200)
    x = np.stack([t * 3, t * 3 + rng.normal(scale=0.01, size=200),
                  rng.normal(scale=0.01, size=200)], axis=1)
    p = st.PCA(x)
    assert p.explained_variance_ratio[0] > 0.95


def test_containers():
    df = ct.DataFrame(default=0)
    df.set("r1", "c1", 5)
    assert df.get("r1", "c1") == 5
    assert df.get("r2", "c9") == 0
    assert "c1" in df.to_tsv()

    ts = ct.DataTables()
    t = ts.add("stats", "desc", ["name", "n"])
    t.set("a", "name", "a")
    t.increment("a", "n")
    t.increment("a", "n")
    assert t.get("a", "n") == 2

    d = {}
    ct.increment(d, "x")
    ct.increment(d, "x")
    ct.increment(d, "y")
    assert ct.most_common_key(d) == "x"


def test_gff3(tmp_path):
    p = tmp_path / "t.gff3"
    p.write_text(
        "##gff-version 3\n"
        "chr1\tsrc\tgene\t100\t500\t.\t+\t.\tID=g1;Name=geneA\n"
        "chr1\tsrc\texon\t100\t200\t.\t+\t.\tParent=g1\n"
        "chr2\tsrc\tgene\t50\t80\t.\t-\t.\tID=g2\n")
    g = gffio.GFF3(p)
    assert len(g) == 3
    genes = g.get_type("gene")
    assert len(genes) == 2
    assert genes[0].get_attribute("Name") == "geneA"
    assert len(g.get_contained("chr1", 1, 300)) == 1
    assert len(g.get_overlapping("chr1", 150, 160)) == 2


def test_table_roundtrip(tmp_path):
    p = tmp_path / "t.tsv"
    w = tblio.TableWriter(p)
    w.add_entry({"a": 1, "b": "x"})
    w.add_entry({"a": 2, "b": "y"})
    w.close()
    rows = list(tblio.TableReader(p))
    assert rows == [{"a": "1", "b": "x"}, {"a": "2", "b": "y"}]
    # explicit columns, headerless file
    p2 = tmp_path / "t2.tsv"
    p2.write_text("1\tx\n2\ty\n")
    rows = list(tblio.TableReader(p2, columns=["a", "b"]))
    assert rows[0] == {"a": "1", "b": "x"}


def test_gfa_export(tmp_path):
    g = fixtures.build_graph({"s": ["AGTTCTGATCTGGG"]}, 5)
    p = tmp_path / "g.gfa"
    # unitigs overlap by k-1 bases (u1 ends ...TGATC, u2 starts GATCT)
    gfaio.write_gfa1(p, g, {"u1": "AGTTCTGATC", "u2": "GATCTGGG"}, "s")
    text = p.read_text()
    assert text.startswith("H\tVN:Z:1.0")
    assert "S\tu1\tAGTTCTGATC" in text
    assert any(line.startswith("L\tu1\t+\tu2\t+") for line in text.splitlines())


def test_visualizer_serves_subgraph():
    g = fixtures.build_graph({"s": ["AGTTCTGATCTGGG"]}, 5)
    e = TraversalEngine(TraversalConfig(graph=g, traversal_colors=[0],
                                        stopping_rule=ContigStopper))
    sub = e.dfs("TTCTG")
    v = viz.GraphVisualizer(port=0)
    try:
        v.display(sub, "test")
        with urllib.request.urlopen(f"http://127.0.0.1:{v.port}/graph") as r:
            payload = json.loads(r.read())
        assert len(payload["vertices"]) == sub.num_vertices()
        assert len(payload["edges"]) == sub.num_edges()
        with urllib.request.urlopen(f"http://127.0.0.1:{v.port}/") as r:
            page = r.read().decode()
        assert "corticall_tpu" in page
        # POST a new subgraph (SendToVisualizer equivalent)
        body = json.dumps({"vertices": [{"id": 0, "kmer": "AAAAA"}],
                           "edges": []}).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{v.port}/post",
                                     data=body, method="POST")
        urllib.request.urlopen(req)
        with urllib.request.urlopen(f"http://127.0.0.1:{v.port}/graph") as r:
            payload = json.loads(r.read())
        assert len(payload["vertices"]) == 1
    finally:
        v.shutdown()


def test_visualizer_search_and_stats():
    """Server with a backing graph: /stats summary and /search on-demand
    neighborhood subgraphs with coverage/novel annotations."""
    g = fixtures.build_graph({"kid": ["AGTTCTGATCTGGGA"],
                              "mom": ["AGTTCTGATCTGGGA"]}, 5)
    from corticall_tpu.commands import core as _core
    rois = _core.find_rois(g, "kid", ["mom"])
    v = viz.GraphVisualizer(port=0, graph=g, rois=rois)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{v.port}/stats") as r:
            st = json.loads(r.read())
        assert st["records"] == g.num_records and st["k"] == 5
        assert st["samples"] == ["kid", "mom"]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/search?kmer=TTCTG&radius=8") as r:
            payload = json.loads(r.read())
        assert payload["vertices"], payload
        assert all("cov" in vv for vv in payload["vertices"])
        assert payload["samples"] == ["kid", "mom"]
        # bad kmer -> structured error, not a crash
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/search?kmer=NNNNN")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        v.shutdown()
