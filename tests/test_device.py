"""Device ops tests: packed kmer ops, hash table, batched walk vs host oracle."""

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from corticall_tpu import device, fixtures, kmer as km
from corticall_tpu.ops import hashtable as ht, kmer_jax as kj, walk as wk
from corticall_tpu.traversal import TraversalConfig, TraversalEngine, to_contig
from corticall_tpu.traversal.stopping import ContigStopper

KS = (5, 16, 17, 31, 32, 47, 63)


def rand_kmers(rng, n, k):
    return rng.integers(0, 4, size=(n, k)).astype(np.uint8)


_jit_revcomp = partial(jax.jit, static_argnames="k")(lambda w, k: kj.revcomp_words(w, k))
_jit_canon = partial(jax.jit, static_argnames="k")(lambda w, k: kj.canonicalize_words(w, k))
_jit_shifts = partial(jax.jit, static_argnames="k")(
    lambda w, b, k: (kj.shift_append(w, b, k), kj.shift_prepend(w, b, k)))


@pytest.mark.parametrize("k", KS)
def test_revcomp_words_matches_host(k):
    rng = np.random.default_rng(k)
    codes = rand_kmers(rng, 64, k)
    words = km.pack_codes(codes)
    want = km.pack_codes(km.revcomp_codes(codes))
    got = np.asarray(_jit_revcomp(jnp.asarray(words), k=k))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k", KS)
def test_canonicalize_words_matches_host(k):
    rng = np.random.default_rng(100 + k)
    codes = rand_kmers(rng, 64, k)
    words = km.pack_codes(codes)
    canon_codes, flipped = km.canonicalize_codes(codes)
    want = km.pack_codes(canon_codes)
    got, got_flip = _jit_canon(jnp.asarray(words), k=k)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(got_flip), flipped)


@pytest.mark.parametrize("k", (5, 31, 47))
def test_shift_ops(k):
    rng = np.random.default_rng(200 + k)
    codes = rand_kmers(rng, 32, k)
    words = jnp.asarray(km.pack_codes(codes))
    nb = rng.integers(0, 4, size=32).astype(np.uint32)
    got_next, got_prev = _jit_shifts(words, jnp.asarray(nb), k=k)
    want_next = km.pack_codes(np.concatenate([codes[:, 1:], nb[:, None]], axis=1))
    np.testing.assert_array_equal(np.asarray(got_next), want_next)
    want_prev = km.pack_codes(np.concatenate([nb[:, None], codes[:, :-1]], axis=1))
    np.testing.assert_array_equal(np.asarray(got_prev), want_prev)


def test_hash_parity_numpy_jax():
    rng = np.random.default_rng(7)
    for k in (5, 31, 47):
        words = km.pack_codes(rand_kmers(rng, 128, k))
        h_np = ht.np_hash_words(words)
        h_jx = np.asarray(kj.hash_words(jnp.asarray(words)))
        np.testing.assert_array_equal(h_np, h_jx)


def test_hashtable_roundtrip():
    rng = np.random.default_rng(8)
    k = 31
    codes = rand_kmers(rng, 5000, k)
    canon, _ = km.canonicalize_codes(codes)
    keys = km.words_to_bytes_be(km.pack_codes(canon), k)
    uniq = np.unique(keys)
    kmers = km.bytes_be_to_words(uniq, k)
    table = ht.build(kmers)
    got = np.asarray(ht.lookup(jnp.asarray(table.slots), jnp.asarray(kmers),
                               jnp.asarray(kmers), table.max_probe))
    np.testing.assert_array_equal(got, np.arange(len(kmers)))
    # misses
    missing = kmers.copy()
    missing[:, -1] ^= np.uint32(2)
    got2 = np.asarray(ht.lookup(jnp.asarray(table.slots), jnp.asarray(kmers),
                                jnp.asarray(missing), table.max_probe))
    in_set = np.isin(km.words_to_bytes_be(missing, k), uniq)
    assert np.all((got2 >= 0) == in_set)


def _random_genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _host_assemble(g, color, seed, max_len=1024):
    e = TraversalEngine(TraversalConfig(graph=g, traversal_colors=[color],
                                        stopping_rule=ContigStopper,
                                        max_branch_length=max_len))
    return to_contig(e.assemble(seed))


def test_device_assemble_matches_host_simple():
    hap = "AGTTCGAATCTGGGCTATATGCT"
    g = fixtures.build_graph({"mom": [hap]}, 7)
    dg = device.DeviceGraph.from_graph(g)
    contigs = wk.assemble_batch(dg, [0], ["ATCTGGG"], num_steps=64)
    assert contigs[0] == hap


def test_device_assemble_cycle_matches_host():
    # McCortex Fig-1: cycle must not be assembled without links
    g = fixtures.build_graph({"t": ["ACTGATTTCGATGCGATGCGATGCCACGGTGG"]}, 5)
    dg = device.DeviceGraph.from_graph(g)
    contigs = wk.assemble_batch(dg, [0], ["ACTGA"], num_steps=64)
    host = _host_assemble(g, 0, "ACTGA")
    assert contigs[0] == host == "ACTGATTTCGATGC"


def test_device_assemble_matches_host_random():
    rng = np.random.default_rng(42)
    k = 11
    genome = _random_genome(rng, 1200)
    g = fixtures.build_graph({"s": [genome]}, k)
    dg = device.DeviceGraph.from_graph(g)
    # seeds: every 97th kmer of the genome
    seeds = [genome[i:i + k] for i in range(0, len(genome) - k, 97)]
    contigs = wk.assemble_batch(dg, [0], seeds, num_steps=1536)
    for seed, got in zip(seeds, contigs):
        want = _host_assemble(g, 0, seed, max_len=1536)
        assert got == want, f"seed {seed}"


def test_device_assemble_multicolor_union():
    g = fixtures.build_graph({
        "mom": ["AGTTCTGATCTGGGCTATATGCT"],
        "dad": ["AGTTCGAATCTGGGCTATATGCT"],
    }, 5)
    dg = device.DeviceGraph.from_graph(g)
    for c, name in ((0, "mom"), (1, "dad")):
        got = wk.assemble_batch(dg, [c], ["CTGGG"], num_steps=64)[0]
        want = _host_assemble(g, c, "CTGGG")
        assert got == want
