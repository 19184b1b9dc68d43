"""Tests for the remaining command ports (extra.py)."""

import numpy as np

from corticall_tpu import fixtures, graph as gr, kmer as km
from corticall_tpu.commands import core, extra
from corticall_tpu.models.reference_index import IndexedReference


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_recover_excluded_kmers():
    rng = np.random.default_rng(81)
    seq = _genome(rng, 400)
    # joined graph where the kid lost coverage on a stretch mom still covers
    g = fixtures.build_graph({"kid": [seq[:200]], "mom": [seq]}, 21)
    dirty = fixtures.build_graph({"kid": [seq]}, 21)   # pre-clean kid graph
    out = extra.recover_excluded_kmers(g, dirty)
    assert out.num_colors == 1
    assert out.sample_names == ["kid"]
    # every mom-covered kmer the dirty graph had is recovered
    outset = {out.kmer_string(i) for i in range(out.num_records)}
    dirtyset = {dirty.kmer_string(i) for i in range(dirty.num_records)}
    gset = {g.kmer_string(i) for i in range(g.num_records)}
    assert outset == dirtyset & gset
    # recovered records carry the dirty coverage
    lost = sorted(outset - {g.kmer_string(i) for i in range(g.num_records)
                            if g.coverages[i, 0] > 0})
    assert lost
    i = out.find_record(lost[0])
    assert out.coverage(i, 0) > 0


def test_compare_rois():
    a = fixtures.build_graph({"s": ["AGTTCTGATCT"]}, 5)
    b = fixtures.build_graph({"s": ["TCTGATCTGGG"]}, 5)
    res = extra.compare_rois(a, b)
    aset = {a.kmer_string(i) for i in range(a.num_records)}
    bset = {b.kmer_string(i) for i in range(b.num_records)}
    assert res["o"] == len(aset & bset)
    assert res["pt"] == len(aset - bset)
    assert res["pe"] == len(bset - aset)


def test_filter_partitions():
    rng = np.random.default_rng(83)
    seq = _genome(rng, 500)
    k = 21
    g = fixtures.build_graph({"kid": [seq], "mom": [seq[:200] + seq[260:]]}, k)
    rois = core.find_rois(g, "kid", ["mom"])
    roiset = {rois.kmer_string(i) for i in range(rois.num_records)}
    good = ("good", seq[150:350])               # many novel kmers, clean ends
    sparse = ("sparse", seq[:100])              # no novel kmers
    kept = extra.filter_partitions([good, sparse], rois, novel_kmer_threshold=5)
    names = [h for h, _ in kept]
    assert "good" in names and "sparse" not in names


def test_combine_contigs_extends():
    rng = np.random.default_rng(85)
    seq = _genome(rng, 400)
    k = 21
    g = fixtures.build_graph({"kid": [seq], "mom": [seq[:150] + seq[250:]]}, k)
    rois = core.find_rois(g, "kid", ["mom"])
    contig = ("c0", seq[100:300])
    partition = ("p0", seq[50:350])
    out = extra.combine_contigs([contig], [partition], rois)
    assert len(out) == 1
    # partition contains the contig -> extended to the partition
    assert out[0][1] == seq[50:350]


def test_coverage_table():
    g = fixtures.build_graph({"s": ["AGTTCTGATCT"]}, 5)
    rows = extra.coverage_table(g, [("c1 x", "AGTTCTGA")], "s")
    assert rows[0][0] == "c1"
    assert all(r[3] >= 1 for r in rows)
    assert len(rows) == 4


def test_sim_to_vcf():
    rng = np.random.default_rng(87)
    parent = _genome(rng, 600)
    pos = 300
    old = parent[pos]
    new = "ACGT"[("ACGT".index(old) + 1) % 4]
    rows = [{
        "type": "SNV", "parent": "mom", "old": old, "new": new,
        "sleft": parent[pos - 100:pos], "sright": parent[pos + 1:pos + 101],
    }, {"type": "RECOMB", "parent": "mom", "old": ".", "new": ".",
        "sleft": ".", "sright": "."}]
    backgrounds = {"mom": IndexedReference({"chr1": parent})}
    vcs = extra.sim_to_vcf(rows, backgrounds)
    assert len(vcs) == 1
    v = vcs[0]
    assert v.chrom == "chr1"
    assert v.start == pos + 1
    assert v.alleles == [old, new]
