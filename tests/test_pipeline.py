"""L6 pipeline orchestration: reads -> build/clean -> thread -> ROIs ->
prefilters -> partition -> call, with on-disk artifacts and resume.

Mirrors the reference's Cromwell stage order (cromwell/wdl/Simulate.wdl:620-1430)
as an in-process resumable run.
"""

import numpy as np
import pytest

from corticall_tpu import simulate as sim
from corticall_tpu.models.reference_index import IndexedReference
from corticall_tpu.pipeline import run_pipeline


K = 21


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


@pytest.fixture(scope="module")
def trio():
    rng = np.random.default_rng(41)
    # embed a 60bp repeat at two loci: the graph branches there, so read
    # threading produces links (a repeat-free random genome has no junctions)
    rep = _genome(rng, 60)
    parent = (_genome(rng, 1200) + rep + _genome(rng, 1400) + rep
              + _genome(rng, 1300))
    pos = 2000
    ins = "TGACGTAGGC"
    child = parent[:pos] + ins + parent[pos:]
    reads = {
        "kid": sim.simulate_reads([child], coverage=40, read_length=150,
                                  error_rate=0.002, seed=1),
        "mom": sim.simulate_reads([parent], coverage=40, read_length=150,
                                  error_rate=0.002, seed=2),
        "dad": sim.simulate_reads([parent], coverage=40, read_length=150,
                                  error_rate=0.002, seed=3),
    }
    refs = {"mom": IndexedReference({"chr1": parent}),
            "dad": IndexedReference({"chr1": parent})}
    return reads, refs, ins, pos


def test_pipeline_end_to_end(tmp_path, trio):
    reads, refs, ins, pos = trio
    res = run_pipeline(str(tmp_path / "wd"), reads, "kid", ["mom", "dad"],
                       references=refs, k=K, min_coverage=2)
    # build/clean removed error kmers: cleaned record counts < raw
    st = res["stats"]
    for s in ("kid", "mom", "dad"):
        bc = st[f"build_clean_{s}"]
        assert bc["clean_records"] < bc["raw_records"]
    # links were threaded and indexed for every sample
    assert all(st[f"thread_{s}"]["kmers_with_links"] > 0
               for s in ("kid", "mom", "dad"))
    # references were threaded as link sets (ThreadRef, Simulate.wdl:714-760)
    assert all(f"thread_ref_{r}" in st for r in ("mom", "dad"))
    # ROIs found, prefilters ran, partition produced contigs
    assert st["find_rois"]["rois"] > 0
    assert "prefilter" in st
    assert st["partition"]["partitions"] >= 1
    # the de-novo insertion was called with exact length
    indels = [v for v in res["variants"]
              if not v.is_symbolic()
              and len(v.alleles[1]) - len(v.alleles[0]) == len(ins)]
    assert indels, [str(v) for v in res["variants"]]
    v = indels[0]
    assert v.chrom == "chr1"
    assert abs(v.start - pos) <= len(ins) + K

    # on-disk artifacts exist (the WDL materializes every intermediate)
    wd = tmp_path / "wd"
    for name in ("kid.clean.ctx", "joined.ctx", "kid.ctp.bgz",
                 "ref_mom.ctp.bgz", "rois.ctx",
                 "partitions.fa", "partitions.trimmed.fa", "calls.vcf",
                 "accounting.txt", "state.json"):
        assert (wd / name).exists(), name


def test_pipeline_resume_skips_completed_stages(tmp_path, trio):
    reads, refs, ins, _ = trio
    wd = str(tmp_path / "wd")
    run_pipeline(wd, reads, "kid", ["mom", "dad"], references=refs, k=K)

    lines = []
    res2 = run_pipeline(wd, reads, "kid", ["mom", "dad"], references=refs,
                        k=K, log=lambda *a: lines.append(" ".join(map(str, a))))
    # every stage was loaded from its artifact, none recomputed
    assert lines and all("resume (cached)" in ln for ln in lines)
    # re-materialized variants still carry the insertion
    assert any(not v.is_symbolic()
               and len(v.alleles[1]) - len(v.alleles[0]) == len(ins)
               for v in res2["variants"])


def test_pipeline_resume_after_partial_run(tmp_path, trio):
    """Kill-mid-run story: delete a late artifact + state entry, re-run,
    and only the missing stages recompute."""
    reads, refs, ins, _ = trio
    wd = tmp_path / "wd"
    run_pipeline(str(wd), reads, "kid", ["mom", "dad"], references=refs, k=K)

    import json
    import os
    state = json.loads((wd / "state.json").read_text())
    for name in ("partition", "trim", "call"):
        state["stages"].pop(name)
    (wd / "state.json").write_text(json.dumps(state))
    os.remove(wd / "partitions.fa")

    lines = []
    res = run_pipeline(str(wd), reads, "kid", ["mom", "dad"], references=refs,
                       k=K, log=lambda *a: lines.append(" ".join(map(str, a))))
    cached = [ln for ln in lines if "resume (cached)" in ln]
    assert any("build_clean_kid" in ln for ln in cached)
    assert any("find_rois" in ln for ln in cached)
    assert not any("partition:" in ln for ln in cached)
    assert any(not v.is_symbolic()
               and len(v.alleles[1]) - len(v.alleles[0]) == len(ins)
               for v in res["variants"])


def test_reads_mode_pipeline_smoke_at_scale(tmp_path):
    """0.3 Mbp reads-mode smoke (round-2 verdict item 10): the demo's exact
    configuration — error-bearing reads, links, prefilters — exercised in CI,
    with the novel-kmer recall asserted so silent kmer loss fails loudly."""
    import sys
    sys.path.insert(0, "/root/repo")
    from demo_pf_cross import make_cross
    from corticall_tpu import simulate as sim
    from corticall_tpu.commands import more
    from corticall_tpu.models.reference_index import IndexedReference

    k = 47
    rng = np.random.default_rng(42)
    mom, dad = make_cross(rng, 0.3, 2, 0.003)
    res = sim.simulate_haploid_child(mom, dad, parents=("mom", "dad"),
                                     mu=2.0, num_variants=4, k=k, seed=7)
    reads = {
        "kid": sim.simulate_reads(list(res["child"].values()), 20.0, 150,
                                  0.002, seed=11),
        "mom": sim.simulate_reads(list(mom.values()), 20.0, 150, 0.002,
                                  seed=12),
        "dad": sim.simulate_reads(list(dad.values()), 20.0, 150, 0.002,
                                  seed=13),
    }
    refs = {"mom": IndexedReference(mom), "dad": IndexedReference(dad)}
    out = run_pipeline(str(tmp_path / "wd"), reads, "kid", ["mom", "dad"],
                       references=refs, k=k, min_coverage=2, max_walk=2000)
    rois = out["rois"]
    assert rois.num_records > 0
    stats = more.evaluate_rois(rois, res["kmers"])
    # every truth novel kmer must survive build+clean+prefilters at 20x
    assert stats["fn"] == 0, stats
    assert len(out["variants"]) > 0
