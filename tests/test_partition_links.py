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
    stats = {}
    got = core.partition(g, rois, links=[links], max_walk=4096, stats=stats)
    want = core._partition_host(g, rois, [links], link_novels=False, max_walk=4096)
    assert got == want
    assert stats["overflow_replays"] == 0


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


def test_partition_links_overflow_replay():
    # CAP+1 distinct link records on one kmer forces the overflow path;
    # output must still equal the host oracle via replay
    from corticall_tpu.ops import walk_links as wl
    rng = np.random.default_rng(29)
    g, rois, links = _mk_graph_with_repeats(rng, 15)
    old_cap = wl.MAX_ADD
    try:
        wl.MAX_ADD = 0   # force every linked arrival to overflow
        stats = {}
        got = core.partition(g, rois, links=[links], max_walk=4096, stats=stats)
    finally:
        wl.MAX_ADD = old_cap
    want = core._partition_host(g, rois, [links], link_novels=False, max_walk=4096)
    assert got == want
