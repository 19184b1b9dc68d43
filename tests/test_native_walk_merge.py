"""Native C++ walk / k-way merge twins vs the numpy reference paths."""

import numpy as np
import pytest

from corticall_tpu import fixtures, kmer as km, native as nat
from corticall_tpu.ops import walk_np as wnp

pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native library unavailable")


def _graph(seed, n, k):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), n))
    return fixtures.build_graph({"s": [genome]}, k), genome, rng


@pytest.mark.parametrize("k", [15, 31, 32, 47, 63])
def test_native_walk_matches_numpy_twin(k):
    g, genome, rng = _graph(300 + k, 20000, k)
    starts = rng.integers(0, 20000 - k, size=48)
    seed_strs = [genome[i:i + k] for i in starts]
    nb, nc, ns = nat.walk_forward_host(
        g.kmers, g.edges[:, 0], km.pack_codes(km.strings_to_codes(seed_strs), k),
        k, 150)
    ob, oc, os_ = wnp.walk_forward_np(g, [0], km.strings_to_codes(seed_strs), 150)
    np.testing.assert_array_equal(nb, ob)
    np.testing.assert_array_equal(nc, oc)
    np.testing.assert_array_equal(ns, os_)


def test_native_walk_cycle():
    k = 21
    genome = "".join(np.random.default_rng(1).choice(list("ACGT"), 600))
    cyc = genome + genome[:k]
    g = fixtures.build_graph({"s": [cyc]}, k)
    seeds = km.pack_codes(km.strings_to_codes([cyc[:k]]), k)
    nb, nc, ns = nat.walk_forward_host(g.kmers, g.edges[:, 0], seeds, k, 3000)
    ob, oc, os_ = wnp.walk_forward_np(g, [0], km.strings_to_codes([cyc[:k]]), 3000)
    np.testing.assert_array_equal(nb, ob)
    np.testing.assert_array_equal(nc, oc)
    assert bool(nc[0])


def test_native_merge_matches_sorted_union():
    k = 31
    g1, genome, rng = _graph(7, 15000, k)
    g2 = fixtures.build_graph(
        {"t": [genome[:8000], "".join(rng.choice(list("ACGT"), 5000))]}, k)
    uw, idx = nat.merge_runs_native([g1.kmers, g2.kmers])
    allb = np.concatenate([g1.data.kmer_bytes, g2.data.kmer_bytes])
    np.testing.assert_array_equal(km.words_to_bytes_be(uw, k), np.unique(allb))
    np.testing.assert_array_equal(km.words_to_bytes_be(uw, k)[idx], allb)


def test_walk_table_reuse_matches_one_shot():
    k = 31
    g, genome, rng = _graph(8, 15000, k)
    wt = nat.WalkTableNative(g.kmers, g.edges[:, 0], k)
    starts = rng.integers(0, 15000 - k, size=16)
    seeds = km.pack_codes(km.strings_to_codes([genome[i:i + k] for i in starts]), k)
    a = wt.walk(seeds, 100)
    b = nat.walk_forward_host(g.kmers, g.edges[:, 0], seeds, k, 100)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
