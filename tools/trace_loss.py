"""Trace where truth novel kmers are lost through the reads pipeline stages."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo_pf_cross import make_cross
from corticall_tpu import simulate as sim
from corticall_tpu import build as bd
from corticall_tpu import kmer as km
from corticall_tpu.commands import core

K = int(os.environ.get("K", "47"))
MBP = float(os.environ.get("MBP", "0.3"))
COV = float(os.environ.get("COV", "20"))


def kmer_set(g):
    return {g.kmer_string(i) for i in range(g.num_records)}


def canon(s):
    return km.canonical_kmer(s)[0]


def main():
    rng = np.random.default_rng(42)
    mom, dad = make_cross(rng, MBP, 2, 0.003)
    res = sim.simulate_haploid_child(mom, dad, parents=("mom", "dad"),
                                     mu=2.0, num_variants=4, k=K, seed=7)
    truth_kmers = {canon(r["kmer"]) for r in res["kmers"]}
    print(f"truth novel kmers: {len(truth_kmers)}")

    reads = {
        "kid": sim.simulate_reads(list(res["child"].values()), COV, 150,
                                  0.002, seed=11),
        "mom": sim.simulate_reads(list(mom.values()), COV, 150, 0.002, seed=12),
        "dad": sim.simulate_reads(list(dad.values()), COV, 150, 0.002, seed=13),
    }

    graphs = {}
    for s in ("kid", "mom", "dad"):
        raw = bd.build_graph_from_reads(reads[s], K, s)
        clean = bd.clean_graph(raw, min_coverage=2)
        graphs[s] = clean
        if s == "kid":
            raw_set = kmer_set(raw)
            missing_raw = truth_kmers - raw_set
            print(f"kid raw: {raw.num_records}; truth missing from raw: "
                  f"{len(missing_raw)}")
            # coverage distribution of truth kmers in raw
            tk = sorted(truth_kmers & raw_set)
            idx = raw.find_records(km.pack_codes(km.strings_to_codes(tk), K))
            covs = raw.coverages[idx, 0]
            print(f"truth kmer coverage in raw: min={covs.min()}, "
                  f"p10={np.percentile(covs, 10):.0f}, median={np.median(covs):.0f}")
            print(f"truth kmers with cov<2: {(covs < 2).sum()}")
            clean_set = kmer_set(clean)
            missing_clean = truth_kmers - clean_set
            print(f"kid clean: {clean.num_records}; truth missing from clean: "
                  f"{len(missing_clean)}")
            # of the ones missing from clean but present in raw with cov>=2:
            lost_by_tips = {t for t in missing_clean if t in raw_set}
            lb = sorted(lost_by_tips)
            if lb:
                i2 = raw.find_records(km.pack_codes(km.strings_to_codes(lb), K))
                c2 = raw.coverages[i2, 0]
                print(f"  lost in clean: {len(lb)} (cov>=2 among them: "
                      f"{(c2 >= 2).sum()} -> tip-clipped)")

    joined = core.join([graphs["kid"], graphs["mom"], graphs["dad"]])
    rois = core.find_rois(joined, "kid", ["mom", "dad"])
    roi_set = kmer_set(rois)
    print(f"rois: {rois.num_records}; truth missing from rois: "
          f"{len(truth_kmers - roi_set)}")

    excluded = []
    for name, fn in (("orphans", lambda: core.find_orphans(joined, rois, ["mom", "dad"])),
                     ("tips", lambda: core.find_tips(joined, rois, ["mom", "dad"])),
                     ("dust", lambda: core.find_dust(joined, rois, ["mom", "dad"])),
                     ("lowcov", lambda: core.find_low_coverage(rois, min_coverage=5)),
                     ("lowcomplexity", lambda: core.find_low_complexity(joined, rois, ["mom", "dad"]))):
        e = fn()
        es = kmer_set(e)
        hit = truth_kmers & es
        print(f"prefilter {name}: excludes {e.num_records}, "
              f"truth kmers excluded: {len(hit)}")
        excluded.append(e)
    final = core.remove(rois, [e for e in excluded if e.num_records])
    fs = kmer_set(final)
    print(f"final rois: {final.num_records}; truth missing: "
          f"{len(truth_kmers - fs)}")


if __name__ == "__main__":
    main()
