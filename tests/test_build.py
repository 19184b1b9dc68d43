"""Graph-construction-from-reads tests (mccortex build/clean/inferedges/thread parity)."""

import numpy as np

from corticall_tpu import build as bd, fixtures, graph as gr, kmer as km
from corticall_tpu.io import reads as rdio
from corticall_tpu.traversal import TraversalConfig, TraversalEngine, to_contig
from corticall_tpu.traversal.stopping import ContigStopper


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _tile_reads(genome, read_len=100, step=25):
    return [genome[i:i + read_len] for i in range(0, len(genome) - read_len + 1, step)]


def test_build_from_reads_matches_genome_graph():
    rng = np.random.default_rng(51)
    genome = _genome(rng, 2000)
    reads = _tile_reads(genome)
    k = 21
    g = bd.build_graph_from_reads(reads, k, "s")
    want = fixtures.build_graph({"s": [genome]}, k)

    # identical kmer set
    np.testing.assert_array_equal(g.kmers, want.kmers)
    # identical edges except possibly at the extreme genome ends not covered
    # by read-interior transitions; with step < read_len - k every adjacency
    # appears inside some read, so edges must be identical too
    np.testing.assert_array_equal(g.edges, want.edges)
    # coverage reflects read multiplicity (> 1 for interior kmers)
    assert g.coverages.max() >= 2


def test_build_handles_n_bases():
    g = bd.build_graph_from_reads(["ACGTNACGTACGTN", "NNNN"], 5, "s")
    ks = {g.kmer_string(i) for i in range(g.num_records)}
    want = fixtures.build_graph({"s": ["ACGTACGTA"]}, 5)
    wantks = {want.kmer_string(i) for i in range(want.num_records)}
    assert ks == wantks


def test_clean_drops_low_coverage():
    rng = np.random.default_rng(53)
    genome = _genome(rng, 1000)
    reads = _tile_reads(genome, 100, 20) * 3       # deep coverage
    reads.append(genome[300:350][:30] + "TTTTACGTACGGA")  # one erroneous read
    k = 21
    g = bd.build_graph_from_reads(reads, k, "s")
    cleaned = bd.clean_graph(g, min_coverage=2)
    want = fixtures.build_graph({"s": [genome]}, k)
    got_ks = {cleaned.kmer_string(i) for i in range(cleaned.num_records)}
    want_ks = {want.kmer_string(i) for i in range(want.num_records)}
    assert got_ks <= want_ks            # no error kmers survive
    assert len(got_ks) >= len(want_ks) - 2 * k  # genome kmers mostly intact


def test_infer_edges_connects_adjacent_kmers():
    # two fragments overlapping by k-1: the boundary adjacency appears in
    # neither fragment, so the edge is absent until inferred
    rng = np.random.default_rng(57)
    genome = _genome(rng, 500)
    k = 21
    m = 250
    g = fixtures.build_graph({"s": [genome[:m + k - 1], genome[m:]]}, k)

    e0 = TraversalEngine(TraversalConfig(graph=g, traversal_colors=[0],
                                         stopping_rule=ContigStopper))
    assert to_contig(e0.walk(genome[:k])) != genome  # broken at the seam

    inferred = bd.infer_edges(g)
    e1 = TraversalEngine(TraversalConfig(graph=inferred, traversal_colors=[0],
                                         stopping_rule=ContigStopper))
    assert to_contig(e1.walk(genome[:k])) == genome


def test_thread_reads_resolves_cycle():
    hap = "ACTGATTTCGATGCGATGCGATGCCACGGTGG"
    g = fixtures.build_graph({"test": [hap]}, 5)
    links = bd.thread_reads(g, ["TTTCGATGCGATGCGATGCCACG"], "test")
    e = TraversalEngine(TraversalConfig(graph=g, traversal_colors=[0],
                                        stopping_rule=ContigStopper, links=[links]))
    assert to_contig(e.walk("ACTGA")) == hap


def test_read_sequences_fasta_fastq(tmp_path):
    fa = tmp_path / "r.fa"
    fa.write_text(">r1\nACGTAC\nGTAC\n>r2\nTTTT\n")
    assert list(rdio.read_sequences(fa)) == ["ACGTACGTAC", "TTTT"]
    fq = tmp_path / "r.fq"
    fq.write_text("@r1\nACGTACGT\n+\nIIIIIIII\n@r2\nGGGG\n+\nIIII\n")
    assert list(rdio.read_sequences(fq)) == ["ACGTACGT", "GGGG"]


def test_native_counting_matches_numpy():
    from corticall_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(73)
    for k in (15, 21, 31, 33, 47, 63):
        genome = _genome(rng, 1500)
        reads = _tile_reads(genome, 100, 30) + ["ACGTNNACGT" * 5]
        kn, cn, inn, on = native.count_kmers_native(reads, k)
        kp, cp, ip, op = bd.count_kmers(reads, k)
        np.testing.assert_array_equal(kn, kp, err_msg=f"k={k} kmers")
        np.testing.assert_array_equal(cn, cp, err_msg=f"k={k} cov")
        np.testing.assert_array_equal(inn, ip, err_msg=f"k={k} in")
        np.testing.assert_array_equal(on, op, err_msg=f"k={k} out")


def test_build_native_matches_fixture():
    from corticall_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(74)
    genome = _genome(rng, 1000)
    g1 = bd.build_graph_from_reads(_tile_reads(genome), 21, "s", use_native=True)
    g2 = bd.build_graph_from_reads(_tile_reads(genome), 21, "s", use_native=False)
    assert g1.record_strings() == g2.record_strings()
