"""Native batched DestinationStopper DFS (closeGaps probes) vs host engine.

ct_dfs_dest must be an exact twin of traversal/engine.py::_dfs_branch with
stopping.DestinationStopper (Call.java:2232-2263 closeGaps): same success
outcome, same subgraph (vertices with copy/index tags and edges), for both
FORWARD probes and REVERSE probes (run natively as forward walks from the
revcomp seed).
"""

import numpy as np
import pytest

from corticall_tpu import fixtures
from corticall_tpu import native as nat
from corticall_tpu.caller.call import graph_from_dfs_edges
from corticall_tpu.io import links as lk
from corticall_tpu.traversal import (FORWARD, OR, REVERSE, TraversalConfig,
                                     TraversalEngine)
from corticall_tpu.traversal.stopping import DestinationStopper

pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native library unavailable")


def _host_dfs(g, color, source, sink, links, direction, max_branch=75000):
    e = TraversalEngine(TraversalConfig(
        graph=g, traversal_colors=[color], direction=direction,
        combination=OR, stopping_rule=DestinationStopper,
        links=list(links), max_branch_length=max_branch))
    return e.dfs(source, sink)


def _gset(sub):
    if sub is None:
        return None
    verts = {(v.kmer, v.copy, v.index) for v in sub.vertices()}
    edges = {((u.kmer, u.copy, u.index), (v.kmer, v.copy, v.index))
             for u in sub.vertices() for v in sub.successors(u)}
    return verts, edges


def _native_probe(g, color, links, source, sink, reverse, max_branch=75000):
    from corticall_tpu import kmer as km
    w = nat.LinksWalkerNative(g, [color], list(links))
    if reverse:
        ok, ed = w.dfs_dest([km.revcomp(source)], [km.revcomp(sink)],
                            max_branch=max_branch, use_links=bool(links))
    else:
        ok, ed = w.dfs_dest([source], [sink], max_branch=max_branch,
                            use_links=bool(links))
    if not ok[0]:
        return None
    return graph_from_dfs_edges(g, ed[0], source, color, reverse)


def _case(genome_parts, k, seed_pairs, with_links, sample="s"):
    genome = "".join(genome_parts)
    haps = {sample: [genome]}
    g = fixtures.build_graph(haps, k)
    links = [lk.build_links(g, haps, sample)] if with_links else []
    for src, sink in seed_pairs:
        for direction, reverse in ((FORWARD, False), (REVERSE, True)):
            if reverse:
                host = _host_dfs(g, 0, sink, src, links, direction)
                got = _native_probe(g, 0, links, sink, src, reverse)
            else:
                host = _host_dfs(g, 0, src, sink, links, direction)
                got = _native_probe(g, 0, links, src, sink, reverse)
            hs = _gset(host)
            gs = _gset(got)
            if hs is None or len(hs[0]) == 0:
                assert gs is None or len(gs[0]) == 0, (direction, src, sink)
            else:
                assert gs == hs, (direction, src, sink)


def test_linear_genome_probes():
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), 400))
    k = 11
    pairs = [(genome[0:k], genome[100:100 + k]),
             (genome[50:50 + k], genome[300:300 + k]),
             (genome[200:200 + k], genome[10:10 + k])]   # unreachable fwd
    _case([genome], k, pairs, with_links=False)
    _case([genome], k, pairs, with_links=True)


def test_branching_genome_probes():
    rng = np.random.default_rng(17)
    k = 11
    shared = "".join(rng.choice(list("ACGT"), 60))
    a = "".join(rng.choice(list("ACGT"), 120))
    bl = "".join(rng.choice(list("ACGT"), 80))
    c = "".join(rng.choice(list("ACGT"), 120))
    # two haplotypes sharing a middle segment: creates junctions at both ends
    h1 = a + shared + c
    h2 = bl + shared + "".join(rng.choice(list("ACGT"), 90))
    haps = {"s": [h1, h2]}
    g = fixtures.build_graph(haps, k)
    for with_links in (False, True):
        links = [lk.build_links(g, haps, "s")] if with_links else []
        pairs = [(h1[0:k], h1[-k:]),
                 (h2[0:k], h1[-k:]),
                 (h1[30:30 + k], shared[20:20 + k]),
                 (h2[0:k], h2[-k:])]
        for src, sink in pairs:
            for direction, reverse in ((FORWARD, False), (REVERSE, True)):
                s0, s1 = (sink, src) if reverse else (src, sink)
                host = _host_dfs(g, 0, s0, s1, links, direction)
                got = _native_probe(g, 0, links, s0, s1, reverse)
                hs = _gset(host)
                gs = _gset(got)
                if hs is None or len(hs[0]) == 0:
                    assert gs is None or len(gs[0]) == 0
                else:
                    assert gs == hs, (with_links, direction, src, sink)


def test_repeat_genome_probes_with_links():
    rng = np.random.default_rng(23)
    k = 11
    unit = "".join(rng.choice(list("ACGT"), 40))
    genome = ("".join(rng.choice(list("ACGT"), 150)) + unit * 3
              + "".join(rng.choice(list("ACGT"), 150)))
    haps = {"s": [genome]}
    g = fixtures.build_graph(haps, k)
    links = [lk.build_links(g, haps, "s")]
    pairs = [(genome[0:k], genome[-k:]),
             (genome[100:100 + k], genome[-60:-60 + k])]
    for src, sink in pairs:
        for direction, reverse in ((FORWARD, False), (REVERSE, True)):
            s0, s1 = (sink, src) if reverse else (src, sink)
            host = _host_dfs(g, 0, s0, s1, links, direction)
            got = _native_probe(g, 0, links, s0, s1, reverse)
            hs = _gset(host)
            gs = _gset(got)
            if hs is None or len(hs[0]) == 0:
                assert gs is None or len(gs[0]) == 0
            else:
                assert gs == hs, (direction, src, sink)


def test_max_branch_cap_matches_host():
    rng = np.random.default_rng(29)
    k = 11
    genome = "".join(rng.choice(list("ACGT"), 600))
    g = fixtures.build_graph({"s": [genome]}, k)
    src, sink = genome[0:k], genome[500:500 + k]
    host = _host_dfs(g, 0, src, sink, [], FORWARD, max_branch=50)
    got = _native_probe(g, 0, [], src, sink, False, max_branch=50)
    hs = _gset(host)
    gs = _gset(got)
    if hs is None or len(hs[0]) == 0:
        assert gs is None or len(gs[0]) == 0
    else:
        assert gs == hs
