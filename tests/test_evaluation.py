"""Evaluation + partition utility tests; fused walk kernel equivalence."""

import numpy as np
import jax.numpy as jnp

from corticall_tpu import evaluation as ev, fixtures, kmer as km
from corticall_tpu.caller.variants import Variant, write_vcf
from corticall_tpu.ops import hashtable as ht, walk as wk


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_vcf_roundtrip_and_kmers(tmp_path):
    v = Variant(chrom="c1", start=50, alleles=["A", "T"],
                attributes={"TYPE": "SNV"}).compute_end_from_alleles()
    p = tmp_path / "x.vcf"
    write_vcf(p, [v], [("c1", 200)])
    rows = ev.read_vcf(p)
    assert rows[0]["chrom"] == "c1" and rows[0]["pos"] == 50
    assert rows[0]["ref"] == "A" and rows[0]["alt"] == "T"
    assert rows[0]["info"]["TYPE"] == "SNV"


def test_evaluate_calls_tp_fn_fp():
    rng = np.random.default_rng(61)
    ref = {"c1": _genome(rng, 1000)}
    k = 21
    seq = ref["c1"]
    # truth: SNP at 300; call set: the same SNP + one bogus call
    alt300 = "ACGT"[("ACGT".index(seq[299]) + 1) % 4]
    truth = [{"chrom": "c1", "pos": 300, "ref": seq[299], "alt": alt300,
              "info": {"TYPE": "SNV"}, "filter": "PASS", "id": "."}]
    bogus_alt = "ACGT"[("ACGT".index(seq[699]) + 2) % 4]
    calls = [
        {"chrom": "c1", "pos": 300, "ref": seq[299], "alt": alt300,
         "info": {}, "filter": "PASS", "id": "."},
        {"chrom": "c1", "pos": 700, "ref": seq[699], "alt": bogus_alt,
         "info": {}, "filter": "PASS", "id": "."},
    ]
    res = ev.evaluate_calls(truth, calls, ref, k)
    assert res["tp"] == 1 and res["fn"] == 0 and res["fp"] == 1
    assert res["by_type"]["SNV"]["tp"] == 1

    # miss the truth entirely
    res2 = ev.evaluate_calls(truth, [calls[1]], ref, k)
    assert res2["tp"] == 0 and res2["fn"] == 1 and res2["fp"] == 1


def test_trim_and_count_partitions():
    rng = np.random.default_rng(63)
    seq = _genome(rng, 2000)
    k = 21
    # novel kmers around position 1000
    rois = set()
    for i in range(990, 1010):
        sk = seq[i:i + k]
        rois.add(min(sk, km.revcomp(sk)))
    parts = [("partition0 len=x", seq)]
    trimmed = ev.trim_partitions(parts, rois, k, margin=100)
    assert len(trimmed) == 1
    tseq = trimmed[0][1]
    assert len(tseq) < len(seq)
    assert seq[1000:1000 + k] in tseq  # novel region retained

    rows = ev.count_novel_kmers_in_partitions(parts, rois, k)
    assert rows[0][0] == "partition0"
    assert rows[0][2] == len(rois)


def test_fused_walk_matches_reference_kernel():
    rng = np.random.default_rng(65)
    genome = _genome(rng, 1500)
    k = 15
    g = fixtures.build_graph({"s": [genome]}, k)
    table = ht.build(g.kmers)
    we = jnp.asarray(table.build_walk_entries(g.kmers, g.edges[:, 0]))

    starts = rng.integers(0, len(genome) - k, size=64)
    seeds_np = km.pack_codes(
        km.strings_to_codes([genome[i:i + k] for i in starts]), k)
    seeds = jnp.asarray(seeds_np)

    b1, c1, s1 = wk.walk_forward(jnp.asarray(table.slots), jnp.asarray(g.kmers),
                                 jnp.asarray(g.edges[:, 0]), seeds, k,
                                 table.max_probe, 128)
    b2, c2, s2 = wk.walk_forward_fused(we, seeds, k, table.max_probe, 128)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_lookup_fused_matches_lookup():
    rng = np.random.default_rng(67)
    k = 31
    codes = rng.integers(0, 4, size=(3000, k)).astype(np.uint8)
    canon, _ = km.canonicalize_codes(codes)
    keys = np.unique(km.words_to_bytes_be(km.pack_codes(canon), k))
    kmers = km.bytes_be_to_words(keys, k)
    table = ht.build(kmers)
    entries = jnp.asarray(table.build_entries(kmers))
    queries = np.concatenate([kmers[::3], kmers[::5] ^ np.uint32(2)])
    got = np.asarray(ht.lookup_fused(entries, jnp.asarray(queries), table.max_probe))
    want = np.asarray(ht.lookup(jnp.asarray(table.slots), jnp.asarray(kmers),
                                jnp.asarray(queries), table.max_probe))
    np.testing.assert_array_equal(got, want)


def test_combined_haplotype_credits_decomposed_mnp():
    import numpy as np
    rng = np.random.default_rng(81)
    parent = "".join(rng.choice(list("ACGT"), 600))
    k = 21
    pos, old = 300, parent[300:306]
    new = "".join("ACGT"[("ACGT".index(c) + 2) % 4] for c in old)
    refs = {"chr1": parent}
    truth = [{"chrom": "chr1", "pos": pos + 1, "ref": old, "alt": new,
              "info": {"TYPE": "MNP"}}]
    # alignment-decomposed representation of the same haplotype: the MNP as
    # an insertion plus a deletion (as affine-gap scoring often emits)
    calls = [
        {"chrom": "chr1", "pos": pos, "ref": parent[pos - 1],
         "alt": parent[pos - 1] + new[:2], "info": {}},
        {"chrom": "chr1", "pos": pos + 1, "ref": old,
         "alt": new[2:], "info": {}},
    ]
    combined = ev.evaluate_calls(truth, calls, refs, k, combine_window=100)
    assert combined["tp"] == 1        # joint haplotype matches truth
    assert combined["fp"] == 0
    # the jointly-applied haplotype reproduces the true child sequence
    child = parent[:pos] + new + parent[pos + 6:]
    child_kmers = {min(child[i:i + k], km.revcomp(child[i:i + k]))
                   for i in range(pos - k, pos + 6)}
    joint = ev.combined_alt_kmers(refs, "chr1", pos + 1, calls, k, 100)
    assert joint <= child_kmers or joint & child_kmers
