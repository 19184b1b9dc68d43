"""Device link-following walks vs the host engine oracle."""

import numpy as np
import pytest

from corticall_tpu import device, fixtures
from corticall_tpu.io import links as lk
from corticall_tpu.ops import walk_links as wl
from corticall_tpu.traversal import TraversalConfig, TraversalEngine, to_contig
from corticall_tpu.traversal.stopping import ContigStopper


def _host_assemble(g, color, seed, links, max_len=1024):
    e = TraversalEngine(TraversalConfig(graph=g, traversal_colors=[color],
                                        stopping_rule=ContigStopper,
                                        links=list(links),
                                        max_branch_length=max_len))
    return to_contig(e.assemble(seed))


def test_linked_cycle_assembled_on_device():
    # McCortex Fig-1: the cycle resolves only with links
    haplotypes = {"test": ["ACTGATTTCGATGCGATGCGATGCCACGGTGG"]}
    reads = {"test": ["TTTCGATGCGATGCGATGCCACG"]}
    g = fixtures.build_graph(haplotypes, 5)
    links = lk.build_links(g, reads, "test")
    contigs, overflow = wl.assemble_batch_links(g, [0], [links], ["ACTGA"],
                                                num_steps=128)
    host = _host_assemble(g, 0, "ACTGA", [links])
    assert not overflow[0]
    assert contigs[0] == host == "ACTGATTTCGATGCGATGCGATGCCACGGTGG"


def test_unlinked_matches_host_without_links():
    rng = np.random.default_rng(31)
    genome = "".join(rng.choice(list("ACGT"), 800))
    g = fixtures.build_graph({"s": [genome]}, 15)
    seeds = [genome[i:i + 15] for i in range(0, 700, 173)]
    contigs, overflow = wl.assemble_batch_links(g, [0], [], seeds,
                                                num_steps=1024)
    for seed, got in zip(seeds, contigs):
        want = _host_assemble(g, 0, seed, [])
        assert got == want


def test_linked_walks_match_host_on_repeat_genomes():
    rng = np.random.default_rng(37)
    k = 11
    unit = "".join(rng.choice(list("ACGT"), 60))
    # genome with a tandem repeat the links must navigate
    genome = ("".join(rng.choice(list("ACGT"), 300)) + unit * 3
              + "".join(rng.choice(list("ACGT"), 300)))
    haplotypes = {"s": [genome]}
    g = fixtures.build_graph(haplotypes, k)
    links = lk.build_links(g, haplotypes, "s")

    seeds = [genome[i:i + k] for i in (0, 100, 250, 500, 620)]
    contigs, overflow = wl.assemble_batch_links(g, [0], [links], seeds,
                                                num_steps=2048)
    for seed, got, ov in zip(seeds, contigs, overflow):
        want = _host_assemble(g, 0, seed, [links], max_len=2048)
        if not ov:
            assert got == want, f"seed {seed}"


def test_dfs_sink_case_via_device():
    k = 5
    hap = "GTGTGCTAGGTCTATAGTTATAGGCGCGTCTCCGCAAAAATCGT"
    haplotypes = {"mom": [hap]}
    g = fixtures.build_graph(haplotypes, k)
    links = lk.build_links(g, haplotypes, "mom")
    contigs, overflow = wl.assemble_batch_links(g, [0], [links], [hap[:k]],
                                                num_steps=256)
    host = _host_assemble(g, 0, hap[:k], [links], max_len=256)
    if not overflow[0]:
        assert contigs[0] == host
