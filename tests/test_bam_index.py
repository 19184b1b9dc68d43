"""BAM I/O, kmer->read index, and assembly quality tests."""

import numpy as np

from corticall_tpu import fixtures, kmer as km, kmer_index as ki, quality
from corticall_tpu.io import bam as bamio
from corticall_tpu.models.reference_index import IndexedReference


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _make_bam(tmp_path, reads):
    p = tmp_path / "reads.bam"
    bamio.write_bam(p, [("chr1", 10000)],
                    [{"name": f"r{i}", "seq": s} for i, s in enumerate(reads)])
    return p


def test_bam_roundtrip(tmp_path):
    rng = np.random.default_rng(91)
    reads = [_genome(rng, 80) for _ in range(50)]
    p = _make_bam(tmp_path, reads)
    r = bamio.BamReader(p)
    assert r.refs == ["chr1"]
    got = [(rec["name"], rec["seq"]) for _, _, rec in r]
    assert got == [(f"r{i}", s) for i, s in enumerate(reads)]


def test_bam_record_at(tmp_path):
    rng = np.random.default_rng(92)
    reads = [_genome(rng, 60) for _ in range(30)]
    p = _make_bam(tmp_path, reads)
    r = bamio.BamReader(p)
    offsets = [(vo, rec["name"]) for vo, _, rec in r]
    r2 = bamio.BamReader(p)
    for vo, name in offsets[::7]:
        assert r2.record_at(vo)["name"] == name


def test_kmer_index_query(tmp_path):
    rng = np.random.default_rng(93)
    genome = _genome(rng, 500)
    reads = [genome[i:i + 60] for i in range(0, 440, 20)]
    p = _make_bam(tmp_path, reads)
    k = 21
    ki.index_bam(p, k)
    idx = ki.KmerIndexFile(p, k)
    assert len(idx) > 0
    # every kmer of read 5 retrieves read 5 (amongst others)
    target = reads[5]
    sk = target[10:10 + k]
    hits = idx.query_reads(sk)
    assert any(rec["seq"] == target for rec in hits)
    # missing kmer -> empty
    assert idx.find("T" * k) == [] or all(
        sk not in rec["seq"] for rec in idx.query_reads("T" * k))
    # revcomp query hits the same chunks
    assert idx.find(sk) == idx.find(km.revcomp(sk))


def test_assembly_quality():
    rng = np.random.default_rng(94)
    truth_seq = _genome(rng, 2000)
    # eval assembly with two single-base errors
    eval_seq = list(truth_seq)
    for pos in (500, 1500):
        eval_seq[pos] = "ACGT"[("ACGT".index(eval_seq[pos]) + 1) % 4]
    eval_seq = "".join(eval_seq)
    k = 21
    eval_g = fixtures.build_graph({"eval": [eval_seq]}, k)
    comp_g = fixtures.build_graph({"truth": [truth_seq]}, k)
    ref = IndexedReference({"chr1": eval_seq})
    q = quality.compute_assembly_quality(eval_g, comp_g, ref)
    # ~2 error seeds in 2kb -> Q ~ 30; perfect assembly -> inf
    assert 20 < q < 40
    q_perfect = quality.compute_assembly_quality(comp_g, comp_g,
                                                 IndexedReference({"c": truth_seq}))
    assert q_perfect == float("inf")
