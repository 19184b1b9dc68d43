"""Partition with links: device link kernel vs the exact host engine."""

import numpy as np

from corticall_tpu import fixtures
from corticall_tpu.commands import core
from corticall_tpu.io import links as lk


def _mk_graph_with_repeats(rng, k, n=1200, n_repeats=2, unit_len=40):
    """Child genome with tandem repeats + private novel kmers vs parents."""
    genome = "".join(rng.choice(list("ACGT"), n))
    for _ in range(n_repeats):
        p = int(rng.integers(100, n - 200))
        unit = genome[p:p + unit_len]
        genome = genome[:p] + unit * 3 + genome[p + unit_len:]
    child = list(genome)
    for pos in rng.integers(k, len(child) - k, size=6):
        child[pos] = "ACGT"[(ord(child[pos]) + 1) % 4]
    child = "".join(child)
    g = fixtures.build_graph({"kid": [child], "mom": [genome], "dad": [genome]}, k)
    links = lk.build_links(g, {"kid": [child]}, "kid")
    rois = core.find_rois(g, "kid", ["mom", "dad"])
    return g, rois, links


def test_partition_links_device_matches_host():
    rng = np.random.default_rng(17)
    g, rois, links = _mk_graph_with_repeats(rng, 15)
    assert rois.num_records > 0
    # native path (the small-batch default)
    stats = {}
    got = core.partition(g, rois, links=[links], max_walk=4096, stats=stats)
    want = core._partition_host(g, rois, [links], link_novels=False, max_walk=4096)
    assert got == want
    # device jump-table path (+ exact linked replay of link-touching walks)
    old = core._NATIVE_LINK_THRESHOLD
    try:
        core._NATIVE_LINK_THRESHOLD = -1
        stats_d = {}
        got_d = core.partition(g, rois, links=[links], max_walk=4096,
                               stats=stats_d)
    finally:
        core._NATIVE_LINK_THRESHOLD = old
    assert got_d == want
    assert stats_d["walk_kernel"] == "jump_table"


def test_partition_links_resolves_junctions():
    # a repeat-crossing partition needs link-resolved junction choices
    rng = np.random.default_rng(23)
    k = 15
    flank_a = "".join(rng.choice(list("ACGT"), 300))
    unit = "".join(rng.choice(list("ACGT"), 50))
    flank_b = "".join(rng.choice(list("ACGT"), 300))
    genome = flank_a + unit * 3 + flank_b
    child = list(genome)
    child[150] = "ACGT"[(ord(child[150]) + 1) % 4]  # novel kmers in flank_a
    child = "".join(child)
    g = fixtures.build_graph({"kid": [child], "mom": [genome], "dad": [genome]}, k)
    links = lk.build_links(g, {"kid": [child]}, "kid")
    rois = core.find_rois(g, "kid", ["mom", "dad"])
    stats = {}
    got = core.partition(g, rois, links=[links], max_walk=4096, stats=stats)
    want = core._partition_host(g, rois, [links], link_novels=False, max_walk=4096)
    assert got == want
    # without links the walk stops at the repeat entrance; with links it
    # crosses — the linked partition contig must be longer
    unlinked = core.partition(g, rois, max_walk=4096)
    assert len(got[0][1]) > len(unlinked[0][1])
    assert stats["link_junctions_resolved"] > 0


def test_partition_links_device_replays_link_walks():
    # the device path must route every walk whose path touches a
    # link-carrying kmer to the exact linked replay — on a repeat-crossing
    # graph that is how the linked contig stays identical to the oracle
    rng = np.random.default_rng(29)
    g, rois, links = _mk_graph_with_repeats(rng, 15)
    old_thresh = core._NATIVE_LINK_THRESHOLD
    try:
        core._NATIVE_LINK_THRESHOLD = -1   # force the device path
        stats = {}
        got = core.partition(g, rois, links=[links], max_walk=4096, stats=stats)
    finally:
        core._NATIVE_LINK_THRESHOLD = old_thresh
    want = core._partition_host(g, rois, [links], link_novels=False, max_walk=4096)
    assert got == want
    assert stats["link_replays"] > 0
    assert stats["device_steps"] > 0


def test_partition_links_checkpoint_resume(tmp_path, monkeypatch):
    """Chunked walk checkpointing (native path): a run interrupted after
    chunk 1 resumes at chunk 2 (completed seeds are NOT re-walked), output
    matches an uninterrupted run, and the checkpoint file is cleared on
    completion."""
    import os

    from corticall_tpu import native as nat
    from corticall_tpu.utils import checkpoint as ckpt

    if not nat.available():
        import pytest
        pytest.skip("native walker unavailable")

    rng = np.random.default_rng(17)
    g, rois, links = _mk_graph_with_repeats(rng, 15)
    path = str(tmp_path / "part.ckpt")
    want = core._partition_links_device(g, rois, [links], 4096)
    cks = sorted(rois.kmer_string(i) for i in range(rois.num_records))
    assert len(cks) > 2

    # run chunked with a checkpoint, killing after the first chunk (each
    # chunk makes TWO walk calls: forward + reverse)
    real_walk = nat.LinksWalkerNative.walk
    calls = []

    def dying_walk(self, seeds, num_steps):
        calls.append(len(seeds))
        if len(calls) == 3:              # second chunk's forward walk
            raise KeyboardInterrupt      # simulated kill between chunks
        return real_walk(self, seeds, num_steps)

    monkeypatch.setattr(nat.LinksWalkerNative, "walk", dying_walk)
    with np.testing.assert_raises(KeyboardInterrupt):
        core._partition_links_device(g, rois, [links], 4096,
                                     checkpoint=path, chunk=2)
    assert os.path.exists(path)

    # resume: first chunk is NOT re-walked, output identical, file cleared
    resumed = []

    def counting_walk(self, seeds, num_steps):
        resumed.append(len(seeds))
        return real_walk(self, seeds, num_steps)

    monkeypatch.setattr(nat.LinksWalkerNative, "walk", counting_walk)
    got = core._partition_links_device(g, rois, [links], 4096,
                                       checkpoint=path, chunk=2)
    assert got == want
    assert sum(resumed) == 2 * (len(cks) - 2)  # chunk 1 never re-walked
    assert not os.path.exists(path)
    monkeypatch.setattr(nat.LinksWalkerNative, "walk", real_walk)

    # a checkpoint against a DIFFERENT graph is ignored
    ckpt.save_chunk_state(path, "bogus-fingerprint", 2, {
        "contigs": ["X", "Y"], "junctions": [0, 0]})
    got2 = core._partition_links_device(g, rois, [links], 4096,
                                        checkpoint=path, chunk=2)
    assert got2 == want


def test_native_links_walker_matches_host_cursor():
    """ct_walk_links_host == the host engine cursor (exact LinkStore
    semantics) across repeat fixtures, both orientations."""
    from corticall_tpu import native as nat
    if not nat.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    from corticall_tpu import kmer as km
    from corticall_tpu.traversal import TraversalConfig, TraversalEngine
    from corticall_tpu.traversal.stopping import ContigStopper
    from corticall_tpu.traversal.engine import FORWARD, OR

    for seed_n in (15, 29, 77):
        rng = np.random.default_rng(seed_n)
        g, rois, links = _mk_graph_with_repeats(rng, 15)
        cks = sorted(rois.kmer_string(i) for i in range(rois.num_records))
        seeds = cks + [km.revcomp(s) for s in cks]
        w = nat.LinksWalkerNative(g, [0], [links])
        exts, _ = w.walk(seeds, 4096)
        e = TraversalEngine(TraversalConfig(
            graph=g, traversal_colors=[0], direction=FORWARD, combination=OR,
            stopping_rule=ContigStopper, links=[links],
            max_branch_length=4096))
        for s, ext in zip(seeds, exts):
            want = []
            e.seek(s)
            while e.has_next() and len(want) < 4096:
                want.append(e.next().kmer[-1])
            assert "".join(want) == ext, s


def test_merge_prefix_links_walk_invariant():
    """Prefix-merged links walk identically to raw links (merge safety)."""
    from corticall_tpu.io import links as lkio
    from corticall_tpu import native as nat
    if not nat.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(41)
    g, rois, links = _mk_graph_with_repeats(rng, 15)
    merged = lkio.merge_prefix_links(links)
    assert sum(len(v) for v in merged.records.values()) <= \
        sum(len(v) for v in links.records.values())
    cks = sorted(rois.kmer_string(i) for i in range(rois.num_records))
    a = nat.LinksWalkerNative(g, [0], [links])
    b = nat.LinksWalkerNative(g, [0], [merged])
    ea, _ = a.walk(cks, 4096)
    eb, _ = b.walk(cks, 4096)
    assert ea == eb
