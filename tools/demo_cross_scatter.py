"""Cross-scatter demo artifact: N progeny over shared parent graphs.

The reference's production unit (ProcessPfCross.wdl:41-209): parents built
once, every progeny sample scattered through the full pipeline.  Runs
run_cross_pipeline at PF-shaped scale and prints ONE JSON line with the
shared/per-sample timing split, per-sample call counts, and per-sample
truth recovery — the measured shared-graph-reuse evidence (r4 verdict
item 7).

Env: CS_MBP (default 2), CS_CHROMS (2), CS_PROGENY (4), CS_DNMS (6 per
child), CS_K (47), CS_COVERAGE (20), CS_WORKDIR (/tmp/cross_scatter).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo_pf_cross import make_cross, evaluate
from corticall_tpu import simulate as sim
from corticall_tpu.pipeline import run_cross_pipeline
from corticall_tpu.models.reference_index import IndexedReference


def main():
    mbp = float(os.environ.get("CS_MBP", "2"))
    n_chroms = int(os.environ.get("CS_CHROMS", "2"))
    n_prog = int(os.environ.get("CS_PROGENY", "4"))
    n_dnms = int(os.environ.get("CS_DNMS", "6"))
    k = int(os.environ.get("CS_K", "47"))
    coverage = float(os.environ.get("CS_COVERAGE", "20"))
    workdir = os.environ.get("CS_WORKDIR", "/tmp/cross_scatter")

    rng = np.random.default_rng(42)
    mom, dad = make_cross(rng, mbp, n_chroms, 0.003)
    progeny_reads, truths, recombs = {}, {}, {}
    for i in range(n_prog):
        res = sim.simulate_haploid_child(
            mom, dad, parents=("mom", "dad"), mu=2.0,
            num_variants=n_dnms, k=k, seed=100 + i)
        name = f"kid{i}"
        truths[name] = res["truth_vcf"]
        recombs[name] = res.get("recombs")
        progeny_reads[name] = sim.simulate_reads(
            list(res["child"].values()), coverage, 150, 0.002, seed=200 + i)
    parent_reads = {
        "mom": sim.simulate_reads(list(mom.values()), coverage, 150, 0.002,
                                  seed=301),
        "dad": sim.simulate_reads(list(dad.values()), coverage, 150, 0.002,
                                  seed=302),
    }
    refs = {"mom": IndexedReference(mom), "dad": IndexedReference(dad)}

    t0 = time.perf_counter()
    out = run_cross_pipeline(workdir, parent_reads, progeny_reads,
                             ["mom", "dad"], references=refs, k=k,
                             min_coverage=2, max_walk=2000,
                             log=lambda *a: print(*a, file=sys.stderr))

    samples = {}
    for name, res in out["per_sample"].items():
        ev = evaluate(res["variants"], truths[name], mom, dad, k,
                      recombs=recombs[name])
        samples[name] = {
            "wallclock_s": res["wallclock_s"],
            "rois": res["rois"].num_records,
            "partitions": len(res["partitions"]),
            "calls": len(res["variants"]),
            "calls_after_fdr_filter": len(res.get("filtered_variants") or []),
            "injected": len(truths[name]),
            "strict_recovered": ev["strict_recovered"],
            "kmer_venn": ev["kmer_venn"],
        }

    per_child_total = sum(s["wallclock_s"] for s in samples.values())
    print(json.dumps({
        "metric": "cross_scatter_shared_parents",
        "genome_mbp": mbp, "k": k, "progeny": n_prog,
        "coverage": coverage,
        "shared_parent_build_s": out["shared_parent_build_s"],
        "per_child_total_s": round(per_child_total, 2),
        "total_s": out["total_s"],
        "reuse_saving_s": round(out["shared_parent_build_s"] * (n_prog - 1),
                                2),
        "note": ("parents built once and reused by every child; without the "
                 "scatter each child would pay the shared_parent_build_s "
                 "again (reuse_saving_s = (N-1) x shared build)"),
        "samples": samples,
    }))


if __name__ == "__main__":
    main()
