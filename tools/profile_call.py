"""Profile the Call stage against an existing demo workdir.

Usage: PF_WORKDIR=/tmp/pf06 python tools/profile_call.py
Re-simulates the demo's references deterministically (cheap), deletes the
call artifacts from the workdir so only the call stage re-runs, and profiles
run_pipeline with cProfile.
"""
import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import demo_pf_cross as demo
from corticall_tpu import simulate as sim
from corticall_tpu import pipeline as pl
from corticall_tpu.models.reference_index import IndexedReference

workdir = os.environ.get("PF_WORKDIR", "/tmp/pf06")
mbp = float(os.environ.get("PF_MBP", "0.6"))
chroms = int(os.environ.get("PF_CHROMS", "2"))
dnms = int(os.environ.get("PF_DNMS", "8"))
coverage = float(os.environ.get("PF_COVERAGE", "20"))
k = int(os.environ.get("PF_K", "47"))

rng = np.random.default_rng(42)
mom, dad = demo.make_cross(rng, mbp, chroms, 0.003)
res = sim.simulate_haploid_child(mom, dad, parents=("mom", "dad"),
                                 mu=2.0, num_variants=dnms, k=k, seed=7)
reads = {
    "kid": sim.simulate_reads(list(res["child"].values()), coverage, 150,
                              0.002, seed=11),
    "mom": sim.simulate_reads(list(mom.values()), coverage, 150, 0.002,
                              seed=12),
    "dad": sim.simulate_reads(list(dad.values()), coverage, 150, 0.002,
                              seed=13),
}
refs = {"mom": IndexedReference(mom), "dad": IndexedReference(dad)}

for f in ("calls.vcf", "accounting.txt"):
    p = os.path.join(workdir, f)
    if os.path.exists(p):
        os.remove(p)
import json
sp = os.path.join(workdir, "state.json")
st = json.load(open(sp))
st["stages"].pop("call", None)
json.dump(st, open(sp, "w"))

prof = cProfile.Profile()
prof.enable()
result = pl.run_pipeline(workdir, reads, child="kid", parents=["mom", "dad"],
                         references=refs, k=k, min_coverage=2, max_walk=2000)
prof.disable()
s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
print("call seconds:", result["stages"].get("call"))
