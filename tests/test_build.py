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


def _links_as_sets(ld):
    return {ks: {(jr.forward, jr.choices) for jr in recs}
            for ks, recs in ld.records.items() if recs}


def test_thread_reads_matches_build_links_oracle():
    """Vectorized thread_reads == io.links.build_links on clean reads."""
    from corticall_tpu.io import links as lk
    rng = np.random.default_rng(91)
    k = 11
    unit = _genome(rng, 60)
    genome = (_genome(rng, 400) + unit * 3 + _genome(rng, 300)
              + unit + _genome(rng, 200))
    g = fixtures.build_graph({"s": [genome]}, k)
    reads = [genome[i:i + 120] for i in range(0, len(genome) - 120, 37)]
    want = lk.build_links(g, {"s": reads}, "s")
    got = bd.thread_reads(g, reads, "s")
    assert _links_as_sets(got) == _links_as_sets(want)


def test_thread_reads_breaks_at_absent_kmers():
    """A read bridging a kmer absent from the graph must not emit links whose
    choices span the gap (the graph walk could never follow them)."""
    rng = np.random.default_rng(92)
    k = 11
    unit = _genome(rng, 40)
    genome = _genome(rng, 200) + unit * 2 + _genome(rng, 200)
    g = fixtures.build_graph({"s": [genome]}, k)
    # read with a single error in a non-repetitive region: its kmers around
    # the error are absent, so threading must treat the two halves
    # independently
    pos = 100
    bad = genome[:pos] + ("A" if genome[pos] != "A" else "C") + genome[pos + 1:]
    got = bd.thread_reads(g, [bad], "s")
    # choices must be consistent with links built from the two clean halves
    from corticall_tpu.io import links as lk
    want = lk.build_links(g, {"s": [bad[:pos], bad[pos + 1:]]}, "s")
    got_sets = _links_as_sets(got)
    want_sets = _links_as_sets(want)
    for ks, recs in got_sets.items():
        assert ks in want_sets and recs <= want_sets[ks], ks


def test_clean_clips_error_tips_at_scale():
    rng = np.random.default_rng(93)
    genome = _genome(rng, 5000)
    k = 21
    from corticall_tpu import simulate as sim
    reads = sim.simulate_reads([genome], coverage=40, read_length=100,
                               error_rate=0.01, seed=5)
    g = bd.build_graph_from_reads(reads, k, "s")
    cleaned = bd.clean_graph(g, min_coverage=4)
    want = fixtures.build_graph({"s": [genome]}, k)
    got_ks = {cleaned.kmer_string(i) for i in range(cleaned.num_records)}
    want_ks = {want.kmer_string(i) for i in range(want.num_records)}
    # no error chains survive; the genome body is intact
    extra = got_ks - want_ks
    assert len(extra) <= 2, f"{len(extra)} error kmers survive"
    assert len(want_ks - got_ks) <= 3 * k


def test_clean_keeps_long_linear_graph():
    rng = np.random.default_rng(94)
    genome = _genome(rng, 3000)
    k = 21
    g = fixtures.build_graph({"s": [genome]}, k)
    cleaned = bd.clean_graph(g, min_coverage=1)
    assert cleaned.num_records == g.num_records  # a long chain is not a tip


def test_clean_drops_short_isolated_chain():
    rng = np.random.default_rng(95)
    genome = _genome(rng, 2000)
    k = 21
    junk = _genome(rng, 30)  # 10 kmers, isolated: both ends free
    g = fixtures.build_graph({"s": [genome, junk]}, k)
    cleaned = bd.clean_graph(g, min_coverage=1)
    want = fixtures.build_graph({"s": [genome]}, k)
    got_ks = {cleaned.kmer_string(i) for i in range(cleaned.num_records)}
    want_ks = {want.kmer_string(i) for i in range(want.num_records)}
    assert got_ks == want_ks


def test_simulate_reads_coverage_and_errors():
    from corticall_tpu import simulate as sim
    rng = np.random.default_rng(96)
    genome = _genome(rng, 10000)
    reads = sim.simulate_reads({"c": genome}, coverage=20, read_length=100,
                               error_rate=0.0, seed=1)
    total = sum(len(r) for r in reads)
    assert abs(total - 20 * len(genome)) < 2 * 100
    # error-free reads are genome substrings (fwd or rc)
    for r in reads[:20]:
        assert r in genome or km.revcomp(r) in genome


def test_thread_reads_native_matches_numpy_on_error_reads():
    """ct_thread_scan == the numpy scan on error-bearing shotgun reads with
    repeats, Ns, and reverse-complemented reads (exact record parity)."""
    from corticall_tpu import simulate as sim
    rng = np.random.default_rng(95)
    core = _genome(rng, 6000)
    # 40bp repeat, spannable by a 90bp read (entry in-branch + exit junction
    # inside one read is what emits a link)
    genome = core[:2500] + core[800:840] + core[2500:]
    k = 21
    reads = sim.simulate_reads([genome], coverage=12, read_length=90,
                               error_rate=0.01, seed=5)
    reads[7] = reads[7][:40] + "N" + reads[7][41:]
    g = bd.clean_graph(bd.build_graph_from_reads(reads, k, "c"),
                       min_coverage=2)
    a = bd.thread_reads(g, reads, "c", use_native=False)
    b = bd.thread_reads(g, reads, "c", use_native=True)
    assert _links_as_sets(a) == _links_as_sets(b)
    assert len(b.records) > 0


def test_infer_edges_native_matches_numpy():
    """ct_infer_edges == the numpy sweeps in both modes on both word widths."""
    from corticall_tpu import simulate as sim
    from corticall_tpu.commands.core import subset_colors
    rng = np.random.default_rng(94)
    genome = _genome(rng, 8000)
    for k in (21, 47):
        reads = sim.simulate_reads([genome], coverage=8, read_length=100,
                                   error_rate=0.01, seed=6)
        g = bd.build_graph_from_reads(reads, k, "c")
        g2 = subset_colors(g, [0], g.coverages[:, 0] >= 2)
        for restrict in (False, True):
            a = bd.infer_edges(g2, restrict=restrict, use_native=False)
            b = bd.infer_edges(g2, restrict=restrict, use_native=True)
            assert np.array_equal(a.edges, b.edges), (k, restrict)


def test_build_determinism_in_dirty_process():
    """Round-2 verdict weak #1 regression: build->clean twice in a process
    that has already exercised the other native paths (walk table, thread
    scan, links walker) must produce byte-identical graphs."""
    import hashlib
    from corticall_tpu import simulate as sim, native
    from corticall_tpu.io import links as lkio

    rng = np.random.default_rng(77)
    genome = _genome(rng, 20000)
    k = 21
    reads = sim.simulate_reads([genome], coverage=10, read_length=100,
                               error_rate=0.01, seed=3)

    def build_once():
        g = bd.clean_graph(bd.build_graph_from_reads(reads, k, "s"),
                           min_coverage=2)
        h = hashlib.md5()
        for a in (g.kmers, g.coverages, g.edges):
            h.update(np.ascontiguousarray(a).tobytes())
        return g, h.hexdigest()

    g1, h1 = build_once()
    # dirty the process: thread links, walk natively, build a links walker
    ld = bd.thread_reads(g1, reads, "s")
    if native.available():
        seeds = np.ascontiguousarray(g1.kmers[:64])
        native.walk_forward_host(g1.kmers,
                                 np.bitwise_or.reduce(g1.edges, axis=1),
                                 seeds, k, 50)
        try:
            native.LinksWalkerNative(g1, [0], [ld])
        except RuntimeError:
            pass
    g2, h2 = build_once()
    assert h1 == h2
    assert g1.num_records == g2.num_records


def test_count_conservation_fence_trips_on_loss():
    """The always-on invariant turns silent kmer loss into a loud error."""
    import pytest

    rng = np.random.default_rng(78)
    reads = [_genome(rng, 300) for _ in range(20)]
    k = 21
    # sanity: untampered build passes the fence
    bd.build_graph_from_reads(reads, k, "s")

    # simulate a lossy counting backend (dropped entries)
    real = bd.count_kmers(reads, k)
    lossy = tuple(a[:-5] for a in real)

    import corticall_tpu.native as native
    orig = native.count_kmers_native
    native.count_kmers_native = lambda seqs, kk: lossy
    try:
        with pytest.raises(RuntimeError, match="conservation"):
            bd.build_graph_from_reads(reads, k, "s")
    finally:
        native.count_kmers_native = orig

    # simulate sort corruption (swapped rows, coverage preserved)
    kmers, cov, im, om = (a.copy() for a in real)
    kmers[[0, 1]] = kmers[[1, 0]]
    native.count_kmers_native = lambda seqs, kk: (kmers, cov, im, om)
    try:
        with pytest.raises(RuntimeError, match="sorted"):
            bd.build_graph_from_reads(reads, k, "s")
    finally:
        native.count_kmers_native = orig


def test_corrupted_so_is_rejected_by_self_test():
    """A garbage .so must fail the load-time self-test, not miscount."""
    import ctypes
    import importlib
    import os
    import corticall_tpu.native as native

    assert native.available()  # ensure a good .so exists first
    lib = native.get_lib()
    assert native._self_test(lib)

    class FakeLib:
        def __getattr__(self, name):
            def bad(*a, **kw):
                return -1
            f = bad
            return f
    assert not native._self_test(FakeLib())
