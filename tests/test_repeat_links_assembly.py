"""BASELINE config-2 style: link-assisted assembly through repeats at scale.

A genome with an exact interior repeat defeats plain (linkless) walks — the
repeat exit is a junction — while read-threaded links resolve it.  Asserts
host-engine/device equality of the linked contigs and the N50 win of links
over plain walks (the McCortex links result the reference pipeline relies
on; Simulate.wdl threads links before Partition/Call)."""

import numpy as np

from corticall_tpu import build as bd
from corticall_tpu import device, fixtures, kmer as km
from corticall_tpu.ops import walk as wk
from corticall_tpu.ops import walk_links as wl
from corticall_tpu.traversal.engine import TraversalConfig, TraversalEngine, BOTH
from corticall_tpu.traversal.utils import to_contig
from corticall_tpu.utils.statistics import n50


K = 31


def _repeat_genome(rng, unique=1200, rep=120):
    # rep must be spanned by reads (length 200 below) for links to resolve it
    a = "".join(rng.choice(list("ACGT"), unique))
    r = "".join(rng.choice(list("ACGT"), rep))
    b = "".join(rng.choice(list("ACGT"), unique))
    c = "".join(rng.choice(list("ACGT"), unique))
    return a + r + b + r + c, (a, r, b, c)


def _reads(rng, genome, length=200, step=20):
    return [genome[i:i + length]
            for i in range(0, len(genome) - length + 1, step)]


def test_links_resolve_repeat_and_raise_n50():
    rng = np.random.default_rng(77)
    genome, (a, r, b, c) = _repeat_genome(rng)
    reads = _reads(rng, genome)
    g = fixtures.build_graph({"ecoli": [genome]}, K)
    links = bd.thread_reads(g, reads, "ecoli")

    # seeds inside each unique region
    seeds = [a[50:50 + K], b[50:50 + K], c[50:50 + K]]

    dg = device.DeviceGraph.from_graph(g)
    plain = wk.assemble_batch(dg, [0], seeds, num_steps=6000)
    linked, overflow = wl.assemble_batch_links(g, [0], [links], seeds,
                                               num_steps=6000)
    assert not overflow.any()

    # plain walks must stop at the repeat junctions; linked walks must
    # reconstruct the full genome from any unique seed
    assert n50([len(s) for s in linked]) > n50([len(s) for s in plain])
    for contig in linked:
        assert contig == genome or km.revcomp(contig) == genome

    # host oracle equality (links path)
    e = TraversalEngine(TraversalConfig(
        graph=g, traversal_colors=[0], direction=BOTH, links=[links]))
    for seed, contig in zip(seeds, linked):
        host = to_contig(e.assemble(seed))
        assert host == contig or km.revcomp(host) == contig


def test_native_build_matches_fixture_on_repeat_genome():
    rng = np.random.default_rng(78)
    genome, _ = _repeat_genome(rng, unique=600, rep=150)
    gf = fixtures.build_graph({"s": [genome]}, K)
    gn = bd.build_graph_from_reads([genome], K, "s")
    assert np.array_equal(gf.kmers, gn.kmers)
    assert np.array_equal(gf.edges, gn.edges)
    assert np.array_equal(gf.coverages, gn.coverages)
