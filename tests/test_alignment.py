"""Alignment stack tests: SW/NW, indexed reference (goldens from KmerLookupTest)."""

import numpy as np
import pytest

from corticall_tpu import kmer as km
from corticall_tpu.io import fasta as faio
from corticall_tpu.models.reference_index import IndexedReference, Interval
from corticall_tpu.models.sw import NeedlemanWunsch, SmithWaterman

TWO_SHORT_FA = "/root/reference/testdata/two_short_contigs.fa"


def test_sw_exact():
    sw = SmithWaterman()
    aq, as_ = sw.get_alignment("ACGTACGT", "TTACGTACGTTT")
    assert aq == "ACGTACGT"
    assert as_ == "ACGTACGT"


def test_sw_mismatch_and_gap():
    sw = SmithWaterman()
    q = "ACGTACCGTAGGT"
    s = "ACGTACGTAGGT"  # q has extra C
    aq, as_ = sw.get_alignment(q, s)
    assert aq.replace("-", "") == q
    assert as_.replace("-", "") in s
    assert "-" in as_  # gap in subject


def test_sw_detailed_nm():
    sw = SmithWaterman()
    d = sw.align_detailed("ACGTTCGT", "ACGTACGT")
    assert d["nm"] == 1
    assert d["score"] == 7 * 5 - 4


def test_nw_global():
    nw = NeedlemanWunsch()
    aq, as_ = nw.get_alignment("ACGT", "ACGT")
    assert (aq, as_) == ("ACGT", "ACGT")
    aq, as_ = nw.get_alignment("ACGGT", "ACGT")
    assert aq.replace("-", "") == "ACGGT"
    assert as_.replace("-", "") == "ACGT"
    assert len(aq) == len(as_) == 5


def test_find_kmers_two_short_contigs():
    # KmerLookupTest.findKmerBySequence semantics: 0-based pos i ->
    # Interval(contig, i+1, i+k, strand)
    ir = IndexedReference(TWO_SHORT_FA, sources=["test"])
    seqs = faio.read_fasta(TWO_SHORT_FA)
    for k in (31, 47):
        for name, seq in seqs.items():
            for i in range(len(seq) - k + 1):
                fwd = seq[i:i + k]
                rev = km.revcomp(fwd)
                assert Interval(name, i + 1, i + k, False) in ir.find(fwd), (name, i)
                assert Interval(name, i + 1, i + k, True) in ir.find(rev)


def test_find_missing_kmer():
    ir = IndexedReference(TWO_SHORT_FA)
    assert len(ir.find("T" * 47)) == 0


def test_find_interval_roundtrip():
    ir = IndexedReference(TWO_SHORT_FA)
    seqs = faio.read_fasta(TWO_SHORT_FA)
    name, seq = next(iter(seqs.items()))
    assert ir.find_interval(Interval(name, 3, 12, False)) == seq[2:12]
    assert ir.find_interval(Interval(name, 3, 12, True)) == km.revcomp(seq[2:12])


def test_sources_sidecar(tmp_path):
    seqs = faio.read_fasta(TWO_SHORT_FA)
    p = tmp_path / "ref.fa"
    faio.write_fasta(p, seqs)
    IndexedReference.create_index(p, "srcA", "srcB")
    ir = IndexedReference(p)
    assert ir.sources == {"srcA", "srcB"}


def test_align_places_contig():
    rng = np.random.default_rng(5)
    genome = "".join(rng.choice(list("ACGT"), 2000))
    ir = IndexedReference({"chr1": genome})
    # exact fragment
    frag = genome[500:700]
    a = ir.align(frag)
    assert a and a[0].contig == "chr1"
    assert a[0].start == 501 and a[0].end == 700
    assert not a[0].negative and a[0].nm == 0 and a[0].mapq == 60
    # revcomp fragment
    a = ir.align(km.revcomp(frag))
    assert a and a[0].negative and a[0].start == 501 and a[0].mapq == 60
    # fragment with a SNP
    mut = frag[:100] + ("A" if frag[100] != "A" else "C") + frag[101:]
    a = ir.align(mut)
    assert a and a[0].nm == 1 and a[0].start == 501
    # unplaceable garbage
    a = ir.align("".join(rng.choice(list("ACGT"), 100)))
    assert not a or a[0].score < 100 * 5 * 0.9


def test_align_repeat_gets_mapq0():
    rng = np.random.default_rng(6)
    unit = "".join(rng.choice(list("ACGT"), 300))
    genome = unit + "".join(rng.choice(list("ACGT"), 200)) + unit
    ir = IndexedReference({"chr1": genome})
    a = ir.align(unit[50:250])
    assert len(a) >= 2
    assert a[0].mapq == 0  # ambiguous placement


def test_interval_combiner():
    import numpy as np
    from corticall_tpu.models.interval_combiner import get_intervals
    rng = np.random.default_rng(9)
    seq = "".join(rng.choice(list("ACGT"), 3000))
    ir = IndexedReference({"chr1": seq})
    k = 21
    walk = ([seq[i:i + k] for i in range(100, 160)]
            + [seq[i:i + k] for i in range(2000, 2030)])
    states = get_intervals(walk, {"ref": ir}, location_window=50,
                           max_states_per_background=2)
    assert len(states) == 2 and all(n == "ref" for n, _ in states)
    ivs = sorted((it.start, it.end) for _, it in states)
    assert ivs[0][0] <= 60 and ivs[0][1] >= 220        # first cluster merged
    assert ivs[1][0] <= 1960 and ivs[1][1] >= 2090     # second cluster merged
    # longest interval first, capped per background
    assert (states[0][1].end - states[0][1].start
            >= states[1][1].end - states[1][1].start)
    one = get_intervals(walk, {"ref": ir}, 50, 1)
    assert len(one) == 1


def test_whole_contig_nahr_split_placement():
    """The lastz role (LastzAligner.java:15-29: whole-contig alignment for
    NAHR analyses): a multi-kb NAHR-mosaic contig — left half from locus A,
    right half from locus B — placed by seed-chain-extend must yield TWO
    confident split alignments, one per donor locus, with the breakpoint
    recoverable from the chain boundaries."""
    import numpy as np
    from corticall_tpu.models.reference_index import IndexedReference

    rng = np.random.default_rng(61)
    chrom = "".join(rng.choice(list("ACGT"), 60_000))
    a_start, b_start, span = 10_000, 40_000, 6_000
    contig = chrom[a_start:a_start + span] + chrom[b_start:b_start + span]
    ref = IndexedReference({"chr1": chrom})
    alns = ref.align(contig, band=256)
    placed = sorted((al.start, al.end) for al in alns[:2])
    assert len(alns) >= 2
    # each half places at its donor locus
    assert abs(placed[0][0] - a_start) < 100
    assert abs(placed[1][0] - b_start) < 100


def test_banded_sw_large_band_matches_host_at_lastz_scale():
    """'Same SW at larger band' (SURVEY §2.3 lastz row): the banded device
    scan at band 512 on 8 kb sequences reproduces the host Gotoh local score
    for a diverged pair — whole-contig-alignment scale, not seed-extension
    scale."""
    import numpy as np
    import jax.numpy as jnp
    from corticall_tpu.models.sw import SmithWaterman
    from corticall_tpu.ops import sw_device as swd

    rng = np.random.default_rng(62)
    n = 8_000
    s = "".join(rng.choice(list("ACGT"), n))
    q = list(s)
    for pos in rng.integers(0, n, size=n // 100):     # 1% divergence
        q[pos] = "ACGT"[(ord(q[pos]) + 1) % 4]
    # a 150 bp deletion mid-way (diagonal shift stays inside band 512's
    # half-width of 256)
    q = "".join(q[:4000] + q[4150:])
    qc = swd.codes_batch([q], len(q))
    sc = swd.codes_batch([s], len(s))
    score, qe, se = swd.banded_sw_scores(jnp.asarray(qc), jnp.asarray(sc),
                                         band=512)
    want = SmithWaterman().align_detailed(q, s)["score"]
    assert abs(float(score[0]) - want) < 1e-3
