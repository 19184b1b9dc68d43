"""ComputeInheritance tests: inherited-allele painting on a simulated pedigree."""

import numpy as np

from corticall_tpu import fixtures, inheritance as inh
from corticall_tpu.models.reference_index import IndexedReference


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def test_inheritance_paints_child_alleles():
    rng = np.random.default_rng(77)
    base = _genome(rng, 1200)
    pos = 600
    # mom carries a SNP allele vs dad at pos
    mom_allele = base[pos]
    dad_allele = "ACGT"[("ACGT".index(mom_allele) + 1) % 4]
    mom = base
    dad = base[:pos] + dad_allele + base[pos + 1:]
    # child inherits mom's allele at the site
    kid = mom

    # graph colors: kid, mom, dad, both parental drafts, canonical ref
    # (carrying dad's haplotype: dad-allele kmers then hit 2 drafts and are
    # filtered, leaving clean mom-allele seed chains — the real-pedigree shape)
    g = fixtures.build_graph({
        "kid": [kid],
        "mom": [mom],
        "dad": [dad],
        "mom_draft": [mom],
        "dad_draft": [dad],
        "ref": [dad],
    }, 21)

    references = {
        "mom_draft": IndexedReference({"mchr": mom}),
        "dad_draft": IndexedReference({"dchr": dad}),
        "ref": IndexedReference({"refchr": dad}),
    }
    parents = {"mom_draft": "mom", "dad_draft": "dad"}

    rows = inh.compute_inheritance(
        g, references, parents, children=["kid"], ref_name="ref")

    # the child's kid color should be painted with an inheritance assignment
    # at the SNP site (type SNP, alleles kid-vs-dad)
    assert len(rows) >= 1
    row = rows[0]
    assert row["type"] == "SNP"
    a, b = row["alleles"].split("/")
    assert {a, b} == {mom_allele, dad_allele}
    assert row["chrom"] == "refchr"
    assert "kid" in row


def test_variant_seeds_require_unique_coordinates():
    rng = np.random.default_rng(78)
    base = _genome(rng, 600)
    g = fixtures.build_graph({
        "kid": [base], "mom": [base], "dad": [base],
        "mom_draft": [base], "ref": [base],
    }, 21)
    references = {"mom_draft": IndexedReference({"m": base}),
                  "ref": IndexedReference({"r": base})}
    # no variant sites: with identical sequences every kmer is shared with
    # both parents, so no seeds survive
    seeds = inh.get_variant_seeds(
        g, g.color_for_sample("ref"),
        {g.color_for_sample("mom"), g.color_for_sample("dad")},
        {g.color_for_sample("mom_draft")}, references)
    assert seeds == []
