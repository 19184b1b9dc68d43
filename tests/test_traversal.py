"""Host traversal engine tests — goldens from TraversalEngineTest.java:97-410."""

from corticall_tpu import fixtures
from corticall_tpu.io import links as lk
from corticall_tpu.traversal import (
    AND, BOTH, TraversalConfig, TraversalEngine, to_contig, to_walk,
)
from corticall_tpu.traversal import utils as tu
from corticall_tpu.traversal.stopping import ContigStopper


def make_engine(g, colors, **kw):
    cfg = TraversalConfig(graph=g, traversal_colors=list(colors),
                          stopping_rule=ContigStopper, **kw)
    return TraversalEngine(cfg)


def test_short_contig_reconstruction():
    g = fixtures.build_graph({
        "mom": ["AGTTCTGATCTGGGCTATATGCT"],
        "dad": ["AGTTCGAATCTGGGCTATATGCT"],
        "kid": ["AGTTCTGATCTGGGCTATGGCTA"],
    }, 5)
    expectations = {
        "mom": "AGTTCTGATCTGGGCTATATGCT",
        "dad": "TTCGAATCTGGGCTATATGCT",
        "kid": "AGTTCTGATCTGGGCTATGGCT",
    }
    for c in range(3):
        e = make_engine(g, [c])
        contig = to_contig(e.walk("CTGGG"))
        assert contig == expectations[g.sample_name(c)], g.sample_name(c)


def test_recruitment():
    g = fixtures.build_graph({
        "mom": ["AGTTCTGATCTGGGCTATATGCT"],
        "dad": ["AGTTCTGATCTGGGCTATATGCT"],
        "kid": ["AGTTCTG", "ATGGCTA"],
    }, 5)
    kid = g.color_for_sample("kid")
    parents = g.colors_for_samples(["mom", "dad"])

    for use_recruitment, expected in ((True, "AGTTCTGATCTGGGCTATATGCT"), (False, "AGTTCTG")):
        e = make_engine(g, [kid], combination=AND, direction=BOTH,
                        recruitment_colors=parents if use_recruitment else [])
        contig = to_contig(e.walk("GTTCT"))
        assert contig == expected, use_recruitment


def test_cycles_without_links_are_not_assembled():
    # McCortex paper Figure 1 example (TraversalEngineTest.java:209-226)
    g = fixtures.build_graph({"test": ["ACTGATTTCGATGCGATGCGATGCCACGGTGG"]}, 5)
    e = make_engine(g, [g.color_for_sample("test")])
    contig = to_contig(e.walk("ACTGA"))
    assert contig == "ACTGATTTCGATGC"


def test_cycles_with_links_are_assembled():
    # TraversalEngineTest.java:228-250
    haplotypes = {"test": ["ACTGATTTCGATGCGATGCGATGCCACGGTGG"]}
    reads = {"test": ["TTTCGATGCGATGCGATGCCACG"]}
    g = fixtures.build_graph(haplotypes, 5)
    links = lk.build_links(g, reads, "test")
    e = make_engine(g, [g.color_for_sample("test")], links=[links])
    contig = to_contig(e.walk("ACTGA"))
    assert contig == "ACTGATTTCGATGCGATGCGATGCCACGGTGG"


def test_reference_threading_resolves_junction():
    # ThreadRef parity (Simulate.wdl:714-760): thread a *reference* sequence
    # through the sample's graph color and walk with the resulting link set.
    # The Fig-1 cycle cannot be crossed without the annotation; with the
    # reference threaded, the walk transitions through all three repeat
    # copies — a reference-assisted walk (README capability #4).  The link
    # set carries the sample name of the color it was threaded along (the
    # engine's filter, TraversalEngine.java:558) and the reference's name as
    # its source (IndexLinks -s).
    from corticall_tpu import build as bd
    hap = "ACTGATTTCGATGCGATGCGATGCCACGGTGG"
    g = fixtures.build_graph({"kid": [hap]}, 5)
    kid = g.color_for_sample("kid")

    e = make_engine(g, [kid])
    assert to_contig(e.walk("ACTGA")) == "ACTGATTTCGATGC"  # stops at cycle

    ref_links = bd.thread_reads(g, [hap], "kid")
    ref_links.source = "ref1"
    e = make_engine(g, [kid], links=[ref_links])
    assert to_contig(e.walk("ACTGA")) == hap


def test_iterate_fwd_without_path_information():
    hap = "AGTTCGAATCTGGGCTATATGCT"
    g = fixtures.build_graph({"mom": [hap]}, 7)
    e = make_engine(g, [g.color_for_sample("mom")])
    sk = "AGTTCGA"
    out = [sk]
    e.seek(sk)
    while e.has_next():
        cv = e.next()
        out.append(cv.kmer[-1])
    assert "".join(out) == hap


def test_iterate_rev_without_path_information():
    hap = "AGTTCGAATCTGGGCTATATGCT"
    g = fixtures.build_graph({"mom": [hap]}, 7)
    e = make_engine(g, [g.color_for_sample("mom")])
    sk = "ATATGCT"
    out = [sk]
    e.seek(sk)
    while e.has_previous():
        cv = e.previous()
        out.insert(0, cv.kmer[0])
    assert "".join(out) == hap


def test_iterate_fwd_to_fork():
    g = fixtures.build_graph(
        {"kid": ["AGTTCGAATCTGGGCTATATGCT", "AGTTCGAATCTGAGCTATATGCT"]}, 7)
    e = make_engine(g, [g.color_for_sample("kid")])
    sk = "AGTTCGA"
    out = [sk]
    e.seek(sk)
    while e.has_next():
        out.append(e.next().kmer[-1])
    assert "".join(out) == "AGTTCGAATCTG"


def test_iterate_rev_to_fork():
    g = fixtures.build_graph(
        {"kid": ["AGTTCGAATCTGGGCTATATGCT", "AGTTCGAATCTGAGCTATATGCT"]}, 7)
    e = make_engine(g, [g.color_for_sample("kid")])
    sk = "ATATGCT"
    out = [sk]
    e.seek(sk)
    while e.has_previous():
        out.insert(0, e.previous().kmer[0])
    assert "".join(out) == "GCTATATGCT"


def test_go_forward_and_backward():
    hap = "AGTTCGAATCTGAGCTATATGCT"
    k = 7
    g = fixtures.build_graph({"kid": [hap]}, k)
    e = make_engine(g, [g.color_for_sample("kid")])
    for i in range(1, len(hap) - k):
        sk = hap[i:i + k]
        e.seek(sk)
        if e.has_previous() and e.has_next():
            e.next()
            cv = e.previous()
            assert cv.kmer == sk


def test_dfs_source_to_single_sink():
    k = 5
    hap = "GTGTGCTAGGTCTATAGTTATAGGCGCGTCTCCGCAAAAATCGT"
    haplotypes = {"mom": [hap]}
    g = fixtures.build_graph(haplotypes, k)
    links = lk.build_links(g, haplotypes, "mom")
    mom = g.color_for_sample("mom")
    e = make_engine(g, [mom], links=[links])
    source, sink = hap[:k], hap[-k:]
    contig = to_contig(to_walk(e.dfs(source, sink), source, mom))
    assert contig == hap


def test_assemble_bidirectional():
    hap = "AGTTCGAATCTGGGCTATATGCT"
    g = fixtures.build_graph({"mom": [hap]}, 7)
    e = make_engine(g, [g.color_for_sample("mom")])
    contig = to_contig(e.assemble("ATCTGGG"))
    assert contig == hap


def test_links_roundtrip(tmp_path):
    haplotypes = {"test": ["ACTGATTTCGATGCGATGCGATGCCACGGTGG"]}
    reads = {"test": ["TTTCGATGCGATGCGATGCCACG"]}
    g = fixtures.build_graph(haplotypes, 5)
    links = lk.build_links(g, reads, "test")
    p = tmp_path / "t.ctp.gz"
    lk.write_links(p, links)
    links2 = lk.read_links(p)
    assert links2.sample_name == "test"
    assert links2.kmer_size == 5
    assert set(links2.records) == set(links.records)
    for kk in links.records:
        assert sorted(links2.records[kk], key=lambda r: (r.forward, r.choices)) == \
               sorted(links.records[kk], key=lambda r: (r.forward, r.choices))

    # traversal through reloaded links gives the same contig
    e = make_engine(g, [g.color_for_sample("test")], links=[links2])
    assert to_contig(e.walk("ACTGA")) == "ACTGATTTCGATGCGATGCGATGCCACGGTGG"


def test_connected_components():
    g = fixtures.build_graph({"kid": ["AGTTCTGCA", "TTATGGCTA"]}, 5)
    e = make_engine(g, [0])
    d1 = e.dfs("GTTCT")
    comps = tu.connected_components(d1)
    assert len(comps) == 1


def test_indexed_links_roundtrip(tmp_path):
    """BGZF + binary .idx random access matches the in-memory links."""
    from corticall_tpu.io import links as lk2
    haplotypes = {"test": ["ACTGATTTCGATGCGATGCGATGCCACGGTGG"]}
    reads = {"test": ["TTTCGATGCGATGCGATGCCACG"]}
    g = fixtures.build_graph(haplotypes, 5)
    links = lk2.build_links(g, reads, "test")
    p = tmp_path / "t.ctp.bgz"
    lk2.write_links_indexed(p, links, source="mysrc")
    ra = lk2.open_links(p)
    assert ra.source == "mysrc"
    assert ra.sample_name == "test"
    assert set(ra.index) == set(links.records)
    for kk in links.records:
        got = sorted(ra.get(kk), key=lambda r: (r.forward, r.choices))
        want = sorted(links.records[kk], key=lambda r: (r.forward, r.choices))
        assert got == want
    # engine walk through random-access links reproduces the cycle golden
    ra.source = ra.source  # facade quacks like LinksData for the engine
    e = make_engine(g, [g.color_for_sample("test")], links=[ra])
    assert to_contig(e.walk("ACTGA")) == "ACTGATTTCGATGCGATGCGATGCCACGGTGG"


def test_bgzf_large_payload_roundtrip(tmp_path):
    from corticall_tpu.io import bgzf
    import numpy as np
    rng = np.random.default_rng(3)
    payload = bytes(rng.integers(32, 126, size=200_000).astype(np.uint8))
    p = tmp_path / "x.bgz"
    offsets = []
    with bgzf.BgzfWriter(p) as w:
        for i in range(0, len(payload), 7919):
            offsets.append((w.tell(), min(7919, len(payload) - i)))
            w.write(payload[i:i + 7919])
    r = bgzf.BgzfReader(p)
    pos = 0
    for vo, n in offsets:
        assert r.read_at(vo, n) == payload[pos:pos + n]
        pos += n
    # gzip-compatible whole-file read
    import gzip
    assert gzip.open(p, "rb").read() == payload


def test_fill_gaps_closes_walk_gap():
    import numpy as np
    from corticall_tpu import kmer as km
    from corticall_tpu.traversal.utils import fill_gaps
    from corticall_tpu.traversal.subgraph import Vertex
    rng = np.random.default_rng(55)
    genome = "".join(rng.choice(list("ACGT"), 400))
    k = 21
    g = fixtures.build_graph({"s": [genome]}, k)
    kmers = [genome[i:i + k] for i in range(len(genome) - k + 1)]
    walk = [Vertex(sk, g.find_record(sk)) for sk in kmers]
    # remove a middle stretch from the walk: fillGaps must restore it by DFS
    gap_lo, gap_hi = 150, 180
    broken = walk[:gap_lo] + walk[gap_hi:]
    filled = fill_gaps(broken, g, [], [0])
    have = {v.canonical for v in filled.vertices()}
    for sk in kmers[gap_lo:gap_hi]:
        assert min(sk, km.revcomp(sk)) in have
