"""Simulation suite tests + the full simulate->build->call loop (the reference's
evaluation protocol, Simulate.wdl:1209-1330, on a miniature scale)."""

import numpy as np

from corticall_tpu import fixtures, kmer as km, simulate as sim
from corticall_tpu.commands import core
from corticall_tpu.caller.call import Caller
from corticall_tpu.models.reference_index import IndexedReference


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_generators_produce_expected_shapes():
    rng = np.random.default_rng(1)
    seq = _genome(rng, 2000)
    t, p, old, new = sim.gen_snv(seq, 500, rng, 1)
    assert t == "SNV" and len(old) == len(new) == 1 and old != new
    t, p, old, new = sim.gen_ins(seq, 500, rng, 10)
    assert t == "INS" and new.startswith(old) and len(new) == 11
    t, p, old, new = sim.gen_del(seq, 500, rng, 7)
    assert t == "DEL" and len(old) == 8 and new == old[0]
    t, p, old, new = sim.gen_inv(seq, 500, rng, 12)
    assert t == "INV" and new == km.revcomp(old)
    t, p, old, new = sim.gen_tandem_dup(seq, 500, rng, 9)
    assert t == "TD" and new == old + old


def test_recombine_alternates_parents():
    rng = np.random.default_rng(2)
    s1, s2 = _genome(rng, 1000), _genome(rng, 1000)
    pieces, parents = sim.recombine(s1, s2, 3, 21, rng)
    assert sum(len(p) for p in pieces) == 1000
    for a, b in zip(parents, parents[1:]):
        assert a != b
    # pieces come from the right parent
    start = 0
    for piece, par in zip(pieces, parents):
        src = s1 if par == 1 else s2
        assert piece == src[start:start + len(piece)]
        start += len(piece)


def test_simulate_child_and_truth():
    rng = np.random.default_rng(3)
    ref1 = {"p1_chr1": _genome(rng, 3000)}
    ref2 = {"p2_chr1": _genome(rng, 3000)}
    res = sim.simulate_haploid_child(ref1, ref2, parents=("mom", "dad"),
                                     mu=2, num_variants=4, k=21, seed=5)
    assert "chr1" in res["child"]
    assert len(res["variants"]) >= 1
    assert len(res["kmers"]) >= 1
    # novel kmers really are absent from the parents
    parental = set()
    for seq in list(ref1.values()) + list(ref2.values()):
        for i in range(len(seq) - 21 + 1):
            sk = seq[i:i + 21]
            parental.add(min(sk, km.revcomp(sk)))
    for row in res["kmers"]:
        assert min(row["kmer"], km.revcomp(row["kmer"])) not in parental


def test_simulated_snv_recovered_by_caller():
    # closed loop: simulate (no recombination for a clean scenario), build the
    # trio graph, call, compare against the simulator's truth
    rng = np.random.default_rng(7)
    parent = _genome(rng, 1500)
    ref1 = {"chr1": parent}
    ref2 = {"chr1b": parent}
    res = None
    for seed in range(30):
        r = sim.simulate_haploid_child(ref1, ref2, parents=("mom", "dad"),
                                       mu=0, num_variants=1, k=21, seed=seed)
        if len(r["variants"]) == 1 and r["variants"][0]["type"] == "SNV":
            res = r
            break
    assert res is not None, "no SNV scenario found"
    child = res["child"]["chr1"]

    g = fixtures.build_graph({"kid": [child], "mom": [parent], "dad": [parent]}, 21)
    rois = core.find_rois(g, "kid", ["mom", "dad"])
    parts = core.partition(g, rois)
    ir = IndexedReference({"chr1": parent})
    caller = Caller(g, rois, parts, backgrounds=["mom", "dad"],
                    references={"mom": ir, "dad": ir})
    variants, _ = caller.call()
    snps = [v for v in variants if v.is_snp()]
    assert len(snps) == 1
    truth = res["variants"][0]
    assert snps[0].alleles[0].upper() == truth["old"].upper()
    assert snps[0].alleles[1].upper() == truth["new"].upper()


def test_write_tables(tmp_path):
    rng = np.random.default_rng(9)
    ref1 = {"a": _genome(rng, 2000)}
    ref2 = {"b": _genome(rng, 2000)}
    res = sim.simulate_haploid_child(ref1, ref2, mu=1, num_variants=3, k=21, seed=2)
    vp, kp = tmp_path / "v.tsv", tmp_path / "k.tsv"
    sim.write_tables(res, vp, kp)
    lines = vp.read_text().splitlines()
    assert lines[0].startswith("index\tchr\tstart")
    assert any("RECOMB" in l or "SNV" in l or "INS" in l or "DEL" in l
               for l in lines[1:])
