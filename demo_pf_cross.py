"""Pf-scale cross demo: DNM-calling wall-clock on a P. falciparum-scale trio.

BASELINE.md's measurement plan calls for simulated Pf-scale graphs (k=47,
~21 Mbp core genome, trio colors) timed through FindROIs / Partition / Call —
the reference's production path (Simulate.wdl:1209-1430: the Call task is
provisioned 8 GiB / 2 cores per sample on GCP).  This demo runs that exact
pipeline end to end on one host + one TPU chip:

  simulate cross (recombinant child + injected DNMs)
  -> build trio graph (k=47, 3 colors)
  -> FindROIs -> Partition -> Call -> evaluate vs simulation truth

and prints per-stage wall-clock plus truth recall as JSON.

Env knobs: PF_MBP (total genome Mbp, default 21), PF_CHROMS (default 14),
PF_DNMS (default 40), PF_K (default 47), PF_DIVERGENCE (parental SNP rate,
default 0.003).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def make_cross(rng, mbp: float, n_chroms: int, divergence: float):
    """Two parental references: dad = mom with SNP divergence (vectorized)."""
    total = int(mbp * 1e6)
    sizes = np.full(n_chroms, total // n_chroms)
    mom, dad = {}, {}
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i, n in enumerate(sizes):
        codes = rng.integers(0, 4, n, dtype=np.uint8)
        mut = rng.random(n) < divergence
        shift = rng.integers(1, 4, n, dtype=np.uint8)
        dcodes = np.where(mut, (codes + shift) % 4, codes).astype(np.uint8)
        mom[f"chr{i+1}"] = bases[codes].tobytes().decode()
        dad[f"chr{i+1}"] = bases[dcodes].tobytes().decode()
    return mom, dad


def main():
    from corticall_tpu import simulate as sim
    from corticall_tpu.commands import core, more
    from corticall_tpu.caller.call import Caller
    from corticall_tpu.models.reference_index import IndexedReference

    mbp = float(os.environ.get("PF_MBP", "21"))
    n_chroms = int(os.environ.get("PF_CHROMS", "14"))
    n_dnms = int(os.environ.get("PF_DNMS", "40"))
    k = int(os.environ.get("PF_K", "47"))
    divergence = float(os.environ.get("PF_DIVERGENCE", "0.003"))

    rng = np.random.default_rng(42)
    stages = {}

    t0 = time.perf_counter()
    mom, dad = make_cross(rng, mbp, n_chroms, divergence)
    res = sim.simulate_haploid_child(mom, dad, parents=("mom", "dad"),
                                     mu=2.0, num_variants=n_dnms, k=k, seed=7)
    stages["simulate_s"] = round(time.perf_counter() - t0, 2)
    truth = res["truth_vcf"]

    t0 = time.perf_counter()
    from corticall_tpu import build
    gs = [build.build_graph_from_reads(seqs, k, name) for name, seqs in
          [("kid", list(res["child"].values())),
           ("mom", list(mom.values())),
           ("dad", list(dad.values()))]]
    g = core.join(gs)  # == fixtures.build_graph, via the C++ counting core
    stages["build_graph_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rois = core.find_rois(g, "kid", ["mom", "dad"])
    stages["find_rois_s"] = round(time.perf_counter() - t0, 2)
    roi_stats = more.evaluate_rois(rois, res["kmers"])

    # the pipeline trims partitions to novel span +-500 right after this, so
    # a 4 kb contig cap loses nothing (the standalone command default is 40 kb)
    t0 = time.perf_counter()
    parts = core.partition(g, rois, max_walk=2000)
    stages["partition_s"] = round(time.perf_counter() - t0, 2)

    # the WDL pipeline trims partitions to the novel span before calling
    # (TrimPartitions between Partition and Call)
    from corticall_tpu import evaluation as ev
    t0 = time.perf_counter()
    roi_set = {rois.kmer_string(i) for i in range(rois.num_records)}
    parts = ev.trim_partitions(parts, roi_set, k)
    stages["trim_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    refs = {"mom": IndexedReference(mom), "dad": IndexedReference(dad)}
    stages["index_refs_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    caller = Caller(g, rois, parts, backgrounds=["mom", "dad"],
                    references=refs)
    variants, _ = caller.call()
    stages["call_s"] = round(time.perf_counter() - t0, 2)

    # truth recall: a truth variant counts as recovered if a call of matching
    # alleles lands within 25 bp on the same chromosome (aligner placement of
    # indels may shift within homopolymer context)
    def matches(tv, cv):
        if cv.chrom != tv.chrom or abs(cv.start - tv.start) > 25:
            return False
        if cv.is_symbolic():
            return True
        dt = len(tv.alleles[1]) - len(tv.alleles[0])
        dc = len(cv.alleles[1]) - len(cv.alleles[0])
        if dt != dc:
            return False
        return dt != 0 or cv.alleles[1] == tv.alleles[1]

    recovered = sum(1 for tv in truth
                    if any(matches(tv, cv) for cv in variants))

    # the WDL's actual concordance metric: alt-haplotype kmer-Venn overlap
    # (EvaluateAccuracy / ComputeVenn, Simulate.wdl:1209-1330).  Rows build
    # their haplotype in their OWN anchor parent's frame (both produce real
    # child kmers, so cross-anchored pairs still intersect); unmatched truth
    # gets a combined-haplotype second chance in each parent frame, which
    # credits alignment-decomposed MNPs/indel clusters.
    from corticall_tpu import evaluation as ev

    def vrow(v):
        back = v.get_attr("BACKGROUND") or "mom"
        return {"chrom": f"{back}:{v.chrom}", "pos": v.start,
                "ref": v.alleles[0], "alt": v.alleles[1],
                "info": {"TYPE": v.get_attr("TYPE", "UNK")}}

    ref_seqs = {f"mom:{c}": s for c, s in mom.items()}
    ref_seqs.update({f"dad:{c}": s for c, s in dad.items()})
    truth_rows = [vrow(tv) for tv in truth]
    call_rows = [vrow(cv) for cv in variants if not cv.is_symbolic()]
    venn = ev.evaluate_calls(truth_rows, call_rows, ref_seqs, k)
    matched = {ti for ti, _, _ in venn["pairs"]}
    for ti, t in enumerate(truth_rows):
        if ti in matched:
            continue
        tks = ev.variant_alt_kmers(ref_seqs, t["chrom"], t["pos"],
                                   t["ref"], t["alt"], k)
        base = t["chrom"].split(":", 1)[1]
        for scope in ("mom", "dad"):
            cks = ev.combined_alt_kmers(ref_seqs, f"{scope}:{base}",
                                        t["pos"], call_rows, k, 100)
            if tks & cks:
                matched.add(ti)
                break
    # NAHR events surface as symbolic breakend calls (no literal alt allele
    # to kmerize; the reference likewise treats NAHR as multi-breakend
    # evidence) — credit a breakend within 1 kb of the event
    breakends = [(cv.chrom, cv.start) for cv in variants if cv.is_symbolic()]
    for ti, (t, tv) in enumerate(zip(truth_rows, truth)):
        if ti in matched or t["info"]["TYPE"] != "NAHR-INS":
            continue
        if any(c == tv.chrom and abs(p - tv.start) <= 1000
               for c, p in breakends):
            matched.add(ti)
    by_type = {}
    for ti, t in enumerate(truth_rows):
        d = by_type.setdefault(t["info"]["TYPE"], {"tp": 0, "fn": 0})
        d["tp" if ti in matched else "fn"] += 1
    venn = {"tp": len(matched), "fn": len(truth_rows) - len(matched),
            "fp": venn["fp"], "by_type": by_type}

    out = {
        "metric": "pf_scale_cross_call_wallclock",
        "genome_mbp": mbp, "k": k, "colors": 3,
        "graph_records": g.num_records,
        "injected_dnms": len(truth),
        "roi_kmers": rois.num_records,
        "roi_tp": roi_stats["tp"], "roi_fn": roi_stats["fn"],
        "partitions": len(parts),
        "calls": len(variants),
        "truth_recovered": recovered,
        "kmer_venn": {kk: venn[kk] for kk in ("tp", "fn", "fp")},
        "venn_by_type": venn["by_type"],
        "stages": stages,
        "total_pipeline_s": round(sum(v for s, v in stages.items()
                                      if s != "simulate_s"), 2),
    }
    dump = os.environ.get("PF_DUMP")
    if dump:
        detail = {
            "truth": [{**t, "matched": ti in matched}
                      for ti, t in enumerate(truth_rows)],
            "calls": [{"chrom": cv.chrom, "pos": cv.start,
                       "alleles": list(cv.alleles),
                       "background": cv.get_attr("BACKGROUND"),
                       "mapq": cv.get_attr("flankMappingQuality"),
                       "symbolic": cv.is_symbolic()}
                      for cv in variants],
        }
        with open(dump, "w") as f:
            json.dump(detail, f, indent=1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
