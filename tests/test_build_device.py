"""Device kmer counting (ops/build_device.py) vs the host counting oracle:
bit-identical keys, coverage, and edge masks."""

import numpy as np

from corticall_tpu import build as bd
from corticall_tpu.ops import build_device as bdv


def _check(sequences, k, chunk_bases=1 << 14):
    want = bd.count_kmers(sequences, k)
    got = bdv.count_kmers_device(sequences, k, chunk_bases=chunk_bases)
    np.testing.assert_array_equal(got[0], want[0])       # keys
    np.testing.assert_array_equal(got[1], want[1])       # coverage
    np.testing.assert_array_equal(got[2], want[2])       # in masks
    np.testing.assert_array_equal(got[3], want[3])       # out masks


def test_device_count_short_reads():
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), 20000))
    reads = [genome[i:i + 150]
             for i in rng.integers(0, 20000 - 150, size=600)]
    for k in (21, 31, 47):
        _check(reads, k)


def test_device_count_multichunk_boundaries():
    """Reads spanning several flush boundaries: chunk joins must not create
    or lose windows (separator-aligned cuts)."""
    rng = np.random.default_rng(11)
    genome = "".join(rng.choice(list("ACGT"), 30000))
    reads = [genome[i:i + 150]
             for i in rng.integers(0, 30000 - 150, size=1500)]
    _check(reads, 31, chunk_bases=1 << 12)   # many tiny chunks


def test_device_count_long_sequence_pieces():
    """A sequence longer than a chunk goes through the overlapping-piece
    path with explicit window ownership; every window counted exactly once
    and edge masks see the true neighbors through the overlap."""
    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), 40000))
    _check([genome], 31, chunk_bases=1 << 12)
    _check([genome], 47, chunk_bases=1 << 13)


def test_device_count_handles_n_bases():
    rng = np.random.default_rng(17)
    g = list("".join(rng.choice(list("ACGT"), 5000)))
    for pos in rng.integers(50, 4950, size=25):
        g[pos] = "N"
    seq = "".join(g)
    reads = [seq[i:i + 200] for i in range(0, 4800, 90)]
    _check(reads, 21)


def test_device_count_duplicate_and_revcomp_reads():
    """Coverage accumulates across chunks; forward and reverse-complement
    reads hit the same canonical records."""
    from corticall_tpu import kmer as km
    rng = np.random.default_rng(19)
    genome = "".join(rng.choice(list("ACGT"), 3000))
    reads = [genome[i:i + 100] for i in range(0, 2900, 40)]
    reads += [km.revcomp(r) for r in reads]
    reads += reads
    _check(reads, 31, chunk_bases=1 << 12)


def test_build_graph_from_reads_device_flag():
    rng = np.random.default_rng(23)
    genome = "".join(rng.choice(list("ACGT"), 8000))
    reads = [genome[i:i + 120] for i in rng.integers(0, 8000 - 120, size=400)]
    g_host = bd.build_graph_from_reads(reads, 31, "s", use_device=False)
    g_dev = bd.build_graph_from_reads(reads, 31, "s", use_device=True)
    assert g_host.num_records == g_dev.num_records
    np.testing.assert_array_equal(g_host.kmers, g_dev.kmers)
    np.testing.assert_array_equal(g_host.coverages, g_dev.coverages)
    np.testing.assert_array_equal(g_host.edges, g_dev.edges)
