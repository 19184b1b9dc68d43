"""BubbleCaller + PathFinder tests."""

import numpy as np

from corticall_tpu import fixtures
from corticall_tpu.caller.bubbles import Bubble, BubbleCaller, _trim
from corticall_tpu.commands import core
from corticall_tpu.traversal import TraversalConfig, TraversalEngine
from corticall_tpu.traversal.pathfinder import PathFinder
from corticall_tpu.traversal.stopping import ExplorationStopper


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_trim_alleles():
    assert _trim("AAACGTTT", "AAATGTTT") == ("C", "T")
    assert _trim("AAATTT", "AAACGTTT") == ("", "CG")


def test_pathfinder_two_paths():
    # child has two haplotypes through the middle — two paths seed to sink
    g = fixtures.build_graph({
        "kid": ["AGTTCGAATCTGGGCTATATGCT", "AGTTCGAATCTGAGCTATATGCT"],
    }, 7)
    e = TraversalEngine(TraversalConfig(graph=g, traversal_colors=[0],
                                        stopping_rule=ExplorationStopper))
    d = e.dfs("AGTTCGA", "ATATGCT")
    assert d is not None
    v0 = d.find_vertex("AGTTCGA")
    v1 = d.find_vertex("ATATGCT")
    assert v0 is not None and v1 is not None
    pf = PathFinder(d, 0)
    paths = pf.get_paths(v0, v1)
    assert len(paths) == 2
    from corticall_tpu.traversal import to_contig
    contigs = {to_contig(p) for p in paths}
    assert contigs == {"AGTTCGAATCTGGGCTATATGCT", "AGTTCGAATCTGAGCTATATGCT"}


def test_bubble_caller_snp_bubble():
    rng = np.random.default_rng(91)
    parent = _genome(rng, 600)
    pos = 300
    alt = "ACGT"[("ACGT".index(parent[pos]) + 1) % 4]
    child = parent[:pos] + alt + parent[pos + 1:]
    g = fixtures.build_graph({"kid": [child], "mom": [parent], "dad": [parent]}, 21)
    rois = core.find_rois(g, "kid", ["mom", "dad"])
    assert rois.num_records > 0

    bc = BubbleCaller(g, rois, g.color_for_sample("kid"),
                      g.colors_for_samples(["mom", "dad"]))
    seed = None
    for i in range(rois.num_records):
        seed = rois.kmer_string(i)
        bubbles = bc.call(seed, max_pairs=8)
        if bubbles:
            break
    assert bubbles
    b = next(iter(bubbles))
    assert b.ref_allele.upper() == parent[pos]
    assert b.alt_allele.upper() == alt
    assert len(b.novel_kmers) > 0
