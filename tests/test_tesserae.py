"""Tesserae mosaic HMM tests — goldens from TestTesserae.java:13-107."""

import numpy as np

from corticall_tpu.models.tesserae import Tesserae


def _unshared_kmers(s1, s2, k):
    k1 = {s1[i:i + k] for i in range(len(s1) - k + 1)}
    k2 = {s2[i:i + k] for i in range(len(s2) - k + 1)}
    return len(k1 | k2) - len(k1 & k2)


def test_small_mosaic():
    # TestTesserae.smallTest: query = template0 prefix + template1 suffix
    targets = {
        "template0": "GTAGGCGAGTCCCGTTTATA",
        "template1": "CCACAGAAGATGACGCCATT",
    }
    query = "GTAGGCGAGATGACGCCAT"
    ma = Tesserae()
    ps = ma.align(query, targets)
    assert len(ps) == 3
    assert ps[0][0] == "query"
    assert ps[1][0] == "template0"
    assert ps[2][0] == "template1"
    # expected segmentation: GTAGGCG from t0 (0-6), AGATGACGCCAT from t1 (7-18)
    assert ps[1][1].strip().upper() == "GTAGGCG"
    assert ps[1][2] == (0, 6)
    assert ps[2][1].strip().upper() == "AGATGACGCCAT"
    assert ps[2][2] == (7, 18)


def test_another_small():
    # TestTesserae.anotherSmallTest (smoke: runs and covers the query)
    query = "CGAACAGGATGTAGGCGAGATGACGCCATTTATTCTTTTCGTGCATAACAAAACGATAGTAG"
    targets = {
        "template0": "CGAACAGGATCAGGGATAAAACAAATTGATTATTCTTTTCGTGCATAACACGATAGTAG",
        "template1": "GTCATACGACCGTAGGCGAGATGACGCCATTTATTACGGATATTATATTTATATA",
    }
    ma = Tesserae()
    ps = ma.align(query, targets)
    assert ps[0][0] == "query"
    assert len(ps) >= 3
    # query track spells the query (possibly with gap dashes)
    assert ps[0][1].replace("-", "") == query


def test_random_recombination_recovery():
    # TestTesserae.testMosaicAlignment: two random 1000bp templates,
    # recombinations at 200/400/600/800
    rng = np.random.default_rng(123)
    templates = ["".join(rng.choice(list("ACGT"), 1000)) for _ in range(2)]

    expected = []
    rb = []
    last = 0
    phase = 0
    for recomb in (200, 400, 600, 800):
        rb.append(templates[phase][last:recomb])
        expected.append((f"template{phase}", templates[phase][last:recomb]))
        phase ^= 1
        last = recomb
    rb.append(templates[phase][last:999])
    expected.append((f"template{phase}", templates[phase][last:999]))
    query = "".join(rb)

    ma = Tesserae()
    ps = ma.align(query, {"template0": templates[0], "template1": templates[1]})

    assert len(ps) == len(expected) + 1
    for i, (name, seg) in enumerate(expected):
        got_name, got_track, _ = ps[i + 1]
        assert got_name == name, f"segment {i}"
        assert _unshared_kmers(got_track.replace(" ", "").upper(), seg, 47) <= 2


def test_perfect_single_target():
    t = "ACGTACGGTTCAGCATCAGCAAGT"
    ma = Tesserae()
    ps = ma.align(t, {"t0": t})
    assert len(ps) == 2
    assert ps[1][0] == "t0"
    assert ps[1][1].upper() == t
    assert ps[1][2] == (0, len(t) - 1)
    # edit track: all matches
    assert set(ma.edit_track) == {"|"}


def test_deletion_in_query():
    t = "ACGTACGGTTCAGCATCAGCAAGTT"
    query = t[:10] + t[13:]  # 3bp deletion
    ma = Tesserae()
    ps = ma.align(query, {"t0": t})
    assert ps[0][1].replace("-", "") == query
    assert "~" in ma.edit_track  # deletion marks


def test_insertion_in_query():
    t = "ACGTACGGTTCAGCATCAGCAAGTT"
    query = t[:12] + "GGG" + t[12:]
    ma = Tesserae()
    ps = ma.align(query, {"t0": t})
    assert ps[0][1].replace("-", "") == query
    assert "^" in ma.edit_track  # insertion marks
