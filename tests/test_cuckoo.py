"""Cuckoo (bucketized two-choice) walk table vs the linear-probe table."""

import numpy as np
import jax.numpy as jnp

from corticall_tpu import fixtures, kmer as km
from corticall_tpu.ops import cuckoo as ck, hashtable as ht, walk as wk


def _graph(seed, n, k):
    rng = np.random.default_rng(seed)
    genome = "".join(rng.choice(list("ACGT"), n))
    return fixtures.build_graph({"s": [genome]}, k), genome, rng


def test_cuckoo_build_places_every_key():
    g, _, _ = _graph(5, 30000, 21)
    ct = ck.build_cuckoo(g.kmers, g.edges[:, 0])
    tags = ct.buckets.reshape(ct.num_buckets, ck.BUCKET_SIZE, ct.words + 1)[..., -1]
    assert int((tags >= 0x80000000).sum()) == g.num_records


def test_cuckoo_lookup_hit_and_miss():
    g, genome, rng = _graph(6, 20000, 31)
    k = 31
    ct = ck.build_cuckoo(g.kmers, g.edges[:, 0])
    buckets = jnp.asarray(ct.buckets)
    # hits: canonical kmers from the graph -> payload == edge byte
    idx = rng.integers(0, g.num_records, size=200)
    canon = jnp.asarray(g.kmers[idx])
    pay = np.asarray(ck.lookup_payload(buckets, canon, ct.words))
    np.testing.assert_array_equal(pay, g.edges[idx, 0].astype(np.uint32))
    # misses: random kmers (canonicalized) almost surely absent
    rnd = ["".join(rng.choice(list("ACGT"), k)) for _ in range(50)]
    rnd = [s for s in rnd if g.find_record(s) < 0]
    canon_m = jnp.asarray(km.pack_codes(
        km.strings_to_codes([min(s, km.revcomp(s)) for s in rnd]), k))
    assert not np.asarray(ck.lookup_payload(buckets, canon_m, ct.words)).any()


def test_cuckoo_walk_matches_fused():
    for k in (15, 47):
        g, genome, rng = _graph(k, 40000, k)
        table = ht.build(g.kmers, load_factor=0.25)
        entries = jnp.asarray(table.build_walk_entries(g.kmers, g.edges[:, 0]))
        ct = ck.build_cuckoo(g.kmers, g.edges[:, 0])
        buckets = jnp.asarray(ct.buckets)
        starts = rng.integers(0, 40000 - k, size=128)
        seeds = jnp.asarray(km.pack_codes(km.strings_to_codes(
            [genome[i:i + k] for i in starts]), k))
        fb, fc, fs = wk.walk_forward_fused(entries, seeds, k, table.max_probe, 150)
        cb, cc, cs = ck.walk_forward_cuckoo(buckets, seeds, k, 150)
        np.testing.assert_array_equal(np.asarray(fb), np.asarray(cb))
        np.testing.assert_array_equal(np.asarray(fc), np.asarray(cc))
        np.testing.assert_array_equal(np.asarray(fs), np.asarray(cs))


def test_cuckoo_high_load():
    # eviction path must engage and still place everything at load ~0.9
    g, _, _ = _graph(9, 60000, 17)
    ct = ck.build_cuckoo(g.kmers, g.edges[:, 0], load_factor=0.9)
    tags = ct.buckets.reshape(ct.num_buckets, ck.BUCKET_SIZE, ct.words + 1)[..., -1]
    assert int((tags >= 0x80000000).sum()) == g.num_records


def test_walk_np_matches_cuckoo():
    from corticall_tpu.ops import walk_np as wnp
    for k in (15, 47):
        g, genome, rng = _graph(100 + k, 30000, k)
        ct = ck.build_cuckoo(g.kmers, g.edges[:, 0])
        buckets = jnp.asarray(ct.buckets)
        starts = rng.integers(0, 30000 - k, size=96)
        seed_strs = [genome[i:i + k] for i in starts]
        seeds = jnp.asarray(km.pack_codes(km.strings_to_codes(seed_strs), k))
        cb, cc, cs = ck.walk_forward_cuckoo(buckets, seeds, k, 120)
        nb, nc, ns = wnp.walk_forward_np(g, [0], km.strings_to_codes(seed_strs), 120)
        np.testing.assert_array_equal(np.asarray(cb), nb)
        np.testing.assert_array_equal(np.asarray(cc), nc)
        np.testing.assert_array_equal(np.asarray(cs), ns)
