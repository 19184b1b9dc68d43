"""AlignContigs: batched whole-contig aligner vs per-contig ir.align."""

import numpy as np

from corticall_tpu.models.contig_aligner import align_contigs
from corticall_tpu.models.reference_index import IndexedReference


def test_align_contigs_matches_per_contig_align():
    rng = np.random.default_rng(31)
    ref = "".join(rng.choice(list("ACGT"), 20000))
    ir = IndexedReference({"chr1": ref})
    queries = {}
    from corticall_tpu import kmer as km
    for i, (a, L) in enumerate([(500, 800), (3000, 1500), (7000, 2500),
                                (12000, 600)]):
        q = ref[a:a + L]
        if i % 2:
            q = km.revcomp(q)
        queries[f"c{i}"] = q
    out = align_contigs(queries, {"mom": ir}, band=64)
    for qn, q in queries.items():
        want = ir.align(q)
        got = out[qn]
        assert got, qn
        assert (got[0].contig, got[0].start, got[0].end, got[0].negative) \
            == (want[0].contig, want[0].start, want[0].end, want[0].negative)
        assert got[0].mapq == want[0].mapq == 60


def test_align_contigs_nahr_mosaic_splits():
    """A mosaic contig (flankA + donor + flankB) places as split alignments:
    the winner covers one locus, not a gap-riddled bridge (the lastz role
    the NAHR evidence needs)."""
    rng = np.random.default_rng(37)
    ref = "".join(rng.choice(list("ACGT"), 30000))
    ir = IndexedReference({"chr1": ref})
    mosaic = ref[2000:2600] + ref[20000:20700] + ref[2600:3200]
    out = align_contigs({"m": mosaic}, {"mom": ir}, band=512)
    assert out["m"]
    spans = {(a.start // 1000) for a in out["m"]}
    assert len(out["m"]) >= 2 and len(spans) >= 2   # both loci represented
