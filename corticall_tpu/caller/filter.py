"""FilterCalls — the manuscript's false-discovery-rate filter as a command.

The reference ships FilterCalls as an empty stub (discover/call/
FilterCalls.java:10-21 — `execute()` is blank); the actual publication
protocol applies the FDR rule described in the manuscript's Methods
(BASELINE.md FDR row): reject events supported by fewer than 5 novel
k-mers, and hold NAHR breakend records to a multi-breakend standard.
This module implements that protocol over the NOVEL_KMERS INFO field the
caller now emits, so the shipped VCF can be reduced to the
publication-grade call set with one command.
"""

from __future__ import annotations


def filter_calls(variants: list, min_novel_kmers: int = 5,
                 require_nahr_multibreakend: bool = True):
    """Partition `variants` into (kept, rejected) per the manuscript FDR
    protocol.

    - Events with NOVEL_KMERS < min_novel_kmers are rejected (manuscript
      Methods: "events with <5 novel k-mers rejected").
    - Breakend (SVTYPE=BND) records follow their MATEID partner: if either
      end of a pair fails, both are rejected (a half-pair is not a call).
    - With require_nahr_multibreakend, surviving BND records are kept only
      when their partition contributed >= 2 breakend pairs (>= 4 BND
      records) — the manuscript requires multi-breakend or long-read
      support for NAHR, and a lone pair has neither.

    NOVEL_KMERS values may arrive as strings (VCF INFO round-trip).
    """
    def novel_count(v) -> int:
        n = v.get_attr("NOVEL_KMERS", 0)
        try:
            return int(n)
        except (TypeError, ValueError):
            return 0

    def is_bnd(v) -> bool:
        return (v.get_attr("SVTYPE", "") == "BND") or v.is_symbolic()

    # per-partition BND counts for the multi-breakend rule
    bnd_per_partition: dict = {}
    for v in variants:
        if is_bnd(v):
            p = v.get_attr("PARTITION_NAME", v.chrom)
            bnd_per_partition[p] = bnd_per_partition.get(p, 0) + 1

    fails: set = set()
    by_id = {v.id_: v for v in variants if v.id_}
    for v in variants:
        reject = novel_count(v) < min_novel_kmers
        if not reject and is_bnd(v) and require_nahr_multibreakend:
            p = v.get_attr("PARTITION_NAME", v.chrom)
            reject = bnd_per_partition.get(p, 0) < 4
        if reject:
            fails.add(id(v))
            mate = by_id.get(v.get_attr("MATEID"))
            if mate is not None:
                fails.add(id(mate))

    kept = [v for v in variants if id(v) not in fails]
    rejected = [v for v in variants if id(v) in fails]
    return kept, rejected
