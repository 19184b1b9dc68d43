"""Post-run tracer: where did each lost truth event's novel kmers go?

Reads the flagship demo's WORKDIR artifacts (kid.clean.ctx, joined.ctx,
rois.ctx, rois.filtered.ctx — pipeline.run_pipeline's stage outputs),
regenerates the deterministic simulation truth (same seeds as
demo_pf_cross.py), and for every truth event whose novel kmers are missing
from the final ROI set reports per-stage membership counts — separating
"never in the child graph" (read-coverage loss) from "lost at Join",
"lost at FindROIs" (a parent graph contains the kmer), and "removed by a
prefilter" (re-running each finder on the loaded artifacts to name it).

Usage: PF_WORKDIR=/tmp/pf_demo_work python tools/trace_event_loss.py
Env: PF_MBP/PF_CHROMS/PF_DNMS/PF_K must match the run (defaults match).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from demo_pf_cross import make_cross
from corticall_tpu import simulate as sim
from corticall_tpu import graph as gr
from corticall_tpu import kmer as km
from corticall_tpu.io import ctx as ctxio
from corticall_tpu.commands import core


def main():
    workdir = os.environ.get("PF_WORKDIR", "/tmp/pf_demo_work")
    mbp = float(os.environ.get("PF_MBP", "21"))
    n_chroms = int(os.environ.get("PF_CHROMS", "14"))
    n_dnms = int(os.environ.get("PF_DNMS", "40"))
    k = int(os.environ.get("PF_K", "47"))

    rng = np.random.default_rng(42)
    mom, dad = make_cross(rng, mbp, n_chroms, 0.003)
    res = sim.simulate_haploid_child(mom, dad, parents=("mom", "dad"),
                                     mu=2.0, num_variants=n_dnms, k=k, seed=7)

    def load(name):
        p = os.path.join(workdir, name)
        return gr.CortexGraph(ctxio.read_ctx(p)) if os.path.exists(p) else None

    stages = {s: load(f"{s}") for s in
              ("kid.clean.ctx", "joined.ctx", "rois.ctx", "rois.filtered.ctx")}
    missing = [s for s, g in stages.items() if g is None]
    if missing:
        print(f"missing artifacts in {workdir}: {missing}", file=sys.stderr)
        sys.exit(1)

    def member(g, kmer_str):
        return g.find_record(km.canonical_kmer(kmer_str)[0]) >= 0

    by_event: dict = {}
    for r in res["kmers"]:
        by_event.setdefault((r["index"], r["type"], r["chr"], r["pos"]),
                            []).append(r["kmer"])

    final = stages["rois.filtered.ctx"]
    report = []
    for key, kmers in sorted(by_event.items()):
        n_final = sum(member(final, s) for s in kmers)
        if n_final == len(kmers):
            continue                      # fully recovered event
        row = {"event": {"index": key[0], "type": key[1], "chr": key[2],
                         "pos": key[3]},
               "truth_kmers": len(kmers), "in_final_rois": n_final}
        for sname, g in stages.items():
            row[f"in_{sname.replace('.ctx', '').replace('.', '_')}"] = \
                sum(member(g, s) for s in kmers)
        # name the prefilter: rerun each finder on the loaded artifacts
        joined, rois = stages["joined.ctx"], stages["rois.ctx"]
        lost_at_prefilter = (row["in_rois"] > row["in_rois_filtered"])
        if lost_at_prefilter:
            finders = {
                "orphans": lambda: core.find_orphans(joined, rois,
                                                     ["mom", "dad"]),
                "tips": lambda: core.find_tips(joined, rois, ["mom", "dad"]),
                "dust": lambda: core.find_dust(joined, rois, ["mom", "dad"]),
                "lowcomplexity": lambda: core.find_low_complexity(
                    joined, rois, ["mom", "dad"]),
            }
            culprits = {}
            for fname, fn in finders.items():
                try:
                    e = fn()
                except Exception as exc:       # keep tracing the rest
                    culprits[fname] = f"error: {exc}"
                    continue
                hits = sum(member(e, s) for s in kmers) if e.num_records else 0
                if hits:
                    culprits[fname] = hits
            m = core.adaptive_lowcov_threshold(joined, "kid")
            e = core.find_low_coverage(rois, min_coverage=m)
            hits = sum(member(e, s) for s in kmers) if e.num_records else 0
            if hits:
                culprits[f"lowcov(thr={m})"] = hits
            row["prefilter_culprits"] = culprits
        report.append(row)

    print(json.dumps({"workdir": workdir, "lost_events": report}, indent=1))


if __name__ == "__main__":
    main()
