"""Tests for feature tables, simulation reporting, XMFA, checkpointing."""

import numpy as np

from corticall_tpu import device, fixtures, kmer as km, simulate as sim
from corticall_tpu.commands import core, more
from corticall_tpu.io import xmfa as xio
from corticall_tpu.utils import checkpoint as cp
from corticall_tpu.utils.profiling import SectionTimer


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _trio(rng, n=900, k=21):
    parent = _genome(rng, n)
    pos = n // 2
    alt = "ACGT"[("ACGT".index(parent[pos]) + 1) % 4]
    child = parent[:pos] + alt + parent[pos + 1:]
    g = fixtures.build_graph({"kid": [child], "mom": [parent], "dad": [parent]}, k)
    rois = core.find_rois(g, "kid", ["mom", "dad"])
    return g, rois, child


def test_compile_feature_table():
    rng = np.random.default_rng(111)
    g, rois, child = _trio(rng)
    parts = core.partition(g, rois)
    tips = core.find_tips(g, rois, ["mom", "dad"])
    rows = more.compile_feature_table(g, rois, {"tips": tips}, parts, rois)
    assert len(rows) == rois.num_records
    r0 = rows[0]
    for col in ("ck", "partitionName", "numNovelsInPartition", "tips",
                "truth", "covZScore"):
        assert col in r0
    assert all(r["truth"] == "1" for r in rows)  # truth == rois here
    assert any(r["partitionName"].startswith("partition") for r in rows)


def test_evaluate_rois():
    rng = np.random.default_rng(112)
    ref1 = {"a": _genome(rng, 1500)}
    ref2 = {"b": _genome(rng, 1500)}
    res = sim.simulate_haploid_child(ref1, ref2, mu=0, num_variants=2, k=21, seed=3)
    child = res["child"]["chr1"]
    g = fixtures.build_graph({"kid": [child], "p1": [ref1["a"]],
                              "p2": [ref2["b"]]}, 21)
    rois = core.find_rois(g, "kid", ["p1", "p2"])
    stats = more.evaluate_rois(rois, res["kmers"])
    assert stats["tp"] > 0
    assert stats["fn"] == 0  # FindROIs is liberal: finds all simulated novels


def test_kmer_pair_matrix():
    kmer_rows = [
        {"index": 0, "kmer": "AAACG"}, {"index": 0, "kmer": "AACGT"},
        {"index": 1, "kmer": "GGGTC"},
    ]
    contigs = [("c0", "AAACGT"), ("c1", "GGGTCAAACG")]
    m = more.compute_kmer_pair_matrix(kmer_rows, contigs)
    # kmers of the same variant co-occurring -> 1; different variants -> -1
    assert m[0][1] == 1
    assert m[0][2] == -1


def test_inheritance_tracks():
    rows = [{"chrom": "c1", "pos": "100", "kidA": "momref:5", "kidB": "dadref:7"}]
    mat = more.inheritance_to_matrix(rows, ["kidA", "kidB"])
    assert mat[1] == ["c1", "100", "momref", "dadref"]
    tracks = more.inheritance_to_circos_tracks(rows, ["kidA"])
    assert tracks["kidA"] == ["c1 100 101 momref"]
    vrows = [{"chrom": "c1", "pos": 5, "info": {"BACKGROUND": "mom"}}]
    assert more.vcf_to_inheritance_track(vrows) == ["c1 5 mom"]


def test_xmfa(tmp_path):
    p = tmp_path / "a.xmfa"
    p.write_text(
        "> chr1:1-10 + src1\nACGTACGTAC\n"
        "> chr2:5-14 - src2\nACGTAC--AC\n"
        "=\n"
        "> chr1:20-24 +\nAAAAA\n"
        "=\n")
    blocks = xio.read_xmfa(p)
    assert len(blocks) == 2
    assert len(blocks[0]) == 2
    e = blocks[0].entries[1]
    assert (e.seqid, e.start, e.end, e.strand) == ("chr2", 5, 14, "-")
    assert e.sequence == "ACGTAC--AC"


def test_walk_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(113)
    genome = _genome(rng, 1200)
    k = 15
    g = fixtures.build_graph({"s": [genome]}, k)
    dg = device.DeviceGraph.from_graph(g)
    from corticall_tpu.ops import hashtable as ht, walk as wk
    import jax.numpy as jnp
    table = ht.build(np.asarray(dg.kmers))
    entries = jnp.asarray(table.build_walk_entries(
        np.asarray(dg.kmers), np.asarray(dg.combined_edges([0]))))
    seeds = jnp.asarray(km.pack_codes(km.strings_to_codes([genome[:k]]), k))

    # full run vs split run with a checkpoint in between
    full, _, _ = wk.walk_forward_fused(entries, seeds, k, table.max_probe, 600)
    half, _, _ = wk.walk_forward_fused(entries, seeds, k, table.max_probe, 300)

    # frontier after 300 steps
    half_np = np.asarray(half)[:, 0]
    emitted = half_np[half_np >= 0]
    cur_str = genome[:k]
    for b in emitted:
        cur_str = cur_str[1:] + "ACGT"[b]
    cur = km.pack_codes(km.strings_to_codes([cur_str]), k)
    p = tmp_path / "walk.npz"
    cp.save_walk_state(p, cur=cur, active=np.array([True]),
                       bases_so_far=half_np, graph_fp=cp.graph_fingerprint(g))
    state = cp.load_walk_state(p)
    assert state["meta"]["graph"] == cp.graph_fingerprint(g)
    rest, _, _ = cp.resume_walks(dg, [0], state, 300)
    combined = np.concatenate([state["bases"], np.asarray(rest)[:, 0]])
    np.testing.assert_array_equal(combined[combined >= 0],
                                  np.asarray(full)[:, 0][np.asarray(full)[:, 0] >= 0])


def test_section_timer():
    t = SectionTimer()
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    rep = t.report()
    assert "a:" in rep and "peak memory" in rep


def test_annotate_calls():
    from corticall_tpu.io import gff as gffio
    rng = np.random.default_rng(121)
    g, rois, child = _trio(rng)
    parts = core.partition(g, rois)
    rows = [{"chrom": "chr1", "pos": 450, "ref": "A", "alt": "T", "id": ".",
             "filter": "PASS", "info": {"PARTITION_NAME": parts[0][0].split(" ")[0]}}]
    genes = gffio.GFF3(records=[
        gffio.GFF3Record("chr1", "s", "gene", 400, 500, ".", "+", ".", {"ID": "gene1"}),
        gffio.GFF3Record("chr1", "s", "gene", 5000, 6000, ".", "+", ".", {"ID": "far"}),
    ])
    repeats = gffio.GFF3(records=[
        gffio.GFF3Record("chr1", "s", "repeat", 440, 460, ".", "+", ".", {"ID": "rep7"}),
    ])
    bed = [("chr1", 430, 470)]
    out = more.annotate_calls(rows, bed, genes, repeats, parts, rois)
    info = out[0]["info"]
    assert info["REGION"] == "accessory"
    assert info["GENES"] == "gene1"
    assert info["CLOSEST_GENE"] == "gene1"
    assert info["REPEAT"] == "rep7"
    assert info["PARTITION_LENGTH"] > 0
    assert info["PARTITION_NOVELS"] > 0


def test_show_novel_kmers():
    rng = np.random.default_rng(131)
    g, rois, child = _trio(rng)
    parts = core.partition(g, rois)
    lines = more.show_novel_kmers(parts[:1], rois, g)
    assert lines[0] == parts[0][0].split(" ")[0]
    k = rois.kmer_size
    n = len(parts[0][1]) - k
    assert len(lines) == n + 2
    # rows carry novelty flag + the record string (kmer + cov + edges)
    novel_rows = [l for l in lines[1:] if " True " in l]
    assert len(novel_rows) == int(parts[0][0].split("numNovels=")[1])
    first = lines[1].split(" ")
    assert first[0] == f"0/{n}" and len(first[1]) == k


def test_nahr_generator():
    rng = np.random.default_rng(122)
    seq = _genome(rng, 3000)
    t, pos, old, new = sim.gen_nahr(seq, 800, rng, 20)
    if t == "NAHR-INS":
        assert old == seq[pos:pos + len(old)]
        assert new != old
        # the recombinant alternates region/donor: shares a prefix with region
        assert new[:30] == old[:30]
