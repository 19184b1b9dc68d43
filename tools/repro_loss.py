"""Repro harness for the round-2 nondeterministic kmer-loss report.

Builds the exact 0.6 Mbp demo reads (same seeds as demo_pf_cross.py) and
compares the native ct_count_kmers result against the numpy count_kmers
fallback: counts, checksums, and the clean_graph downstream records.
"""
import os
import sys
import hashlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo_pf_cross import make_cross
from corticall_tpu import simulate as sim
from corticall_tpu import build as bd
from corticall_tpu import native


def checksum(arrs):
    h = hashlib.md5()
    for a in arrs:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def main():
    k = 47
    rng = np.random.default_rng(42)
    mom, dad = make_cross(rng, 0.6, 2, 0.003)
    res = sim.simulate_haploid_child(mom, dad, parents=("mom", "dad"),
                                     mu=2.0, num_variants=8, k=k, seed=7)
    reads = sim.simulate_reads(list(res["child"].values()), 15.0, 150, 0.002,
                               seed=11)
    print(f"kid reads: {len(reads)}, bases {sum(len(r) for r in reads)}")

    nat = native.count_kmers_native(reads, k)
    assert nat is not None, "native unavailable"
    print(f"native: n={len(nat[0])} cov_sum={int(nat[1].sum(dtype=np.uint64))} "
          f"md5={checksum(nat)}")

    np_res = bd.count_kmers(reads, k)
    print(f"numpy:  n={len(np_res[0])} cov_sum={int(np_res[1].sum(dtype=np.uint64))} "
          f"md5={checksum(np_res)}")

    same_n = len(nat[0]) == len(np_res[0])
    print(f"count match: {same_n}")
    if same_n:
        for name, a, b in zip(("kmers", "cov", "in", "out"), nat, np_res):
            eq = np.array_equal(np.asarray(a), np.asarray(b))
            print(f"  {name}: {'OK' if eq else 'MISMATCH'}")
    else:
        # where do they diverge?
        from corticall_tpu import kmer as km
        nk = km.words_to_bytes_be(nat[0], k)
        pk = km.words_to_bytes_be(np_res[0], k)
        only_nat = np.setdiff1d(nk, pk)
        only_np = np.setdiff1d(pk, nk)
        print(f"  only in native: {len(only_nat)}, only in numpy: {len(only_np)}")

    # expected total kmer instances (conservation): sum over reads of windows
    total = sum(max(0, len(r) - k + 1) for r in reads)  # reads are ACGT-only
    print(f"expected instances: {total}")


if __name__ == "__main__":
    main()
