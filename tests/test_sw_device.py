"""Device banded SW vs host Gotoh oracle."""

import numpy as np
import pytest

from corticall_tpu.models.sw import SmithWaterman
from corticall_tpu.ops import sw_device as swd


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _cases(rng, n_cases, qlen=120, slen=150, max_shift=20):
    qs, ss = [], []
    for _ in range(n_cases):
        s = _genome(rng, slen)
        shift = int(rng.integers(0, max_shift))
        q = s[shift:shift + qlen]
        kind = rng.integers(0, 4)
        if kind == 1 and len(q) > 40:        # SNP
            p = int(rng.integers(10, len(q) - 10))
            q = q[:p] + "ACGT"[("ACGT".index(q[p]) + 1) % 4] + q[p + 1:]
        elif kind == 2 and len(q) > 40:      # deletion in query
            p = int(rng.integers(10, len(q) - 15))
            q = q[:p] + q[p + 4:]
        elif kind == 3 and len(q) > 40:      # insertion in query
            p = int(rng.integers(10, len(q) - 10))
            q = q[:p] + _genome(rng, 5) + q[p:]
        qs.append(q)
        ss.append(s)
    return qs, ss


def _oracle_scores(qs, ss):
    sw = SmithWaterman()
    return [sw.align_detailed(q, s)["score"] for q, s in zip(qs, ss)]


def test_banded_scan_matches_gotoh():
    rng = np.random.default_rng(101)
    qs, ss = _cases(rng, 24)
    qmax = max(len(q) for q in qs)
    smax = max(len(s) for s in ss)
    qc = swd.codes_batch(qs, qmax)
    sc = swd.codes_batch(ss, smax)
    score, qe, se = swd.banded_sw_scores(qc, sc, band=128)
    want = _oracle_scores(qs, ss)
    np.testing.assert_allclose(np.asarray(score), want, rtol=0, atol=1e-4)


def test_banded_pallas_matches_scan():
    rng = np.random.default_rng(102)
    qs, ss = _cases(rng, 13)  # odd batch exercises tile padding
    qmax = max(len(q) for q in qs)
    smax = max(len(s) for s in ss)
    qc = swd.codes_batch(qs, qmax)
    sc = swd.codes_batch(ss, smax)
    s1, q1, e1 = swd.banded_sw_scores(qc, sc, band=128)
    s2, q2, e2 = swd.banded_sw_pallas(qc, sc, band=128)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(e1))


def test_banded_end_positions():
    # perfect match: ends at (len(q), shift + len(q))
    rng = np.random.default_rng(103)
    s = _genome(rng, 200)
    q = s[30:130]
    qc = swd.codes_batch([q], len(q))
    sc = swd.codes_batch([s], len(s))
    score, qe, se = swd.banded_sw_scores(qc, sc, band=128)
    assert float(score[0]) == 100 * 5.0
    assert int(qe[0]) == 100
    assert int(se[0]) == 130


def test_zero_column_paths_not_lost():
    # regression: a local alignment starting at subject position 0 on a query
    # row > 0 reaches the virtual zero column diagonally; the band-window
    # layout used to mask that column to -inf and lose the path
    rng = np.random.default_rng(104)
    s = _genome(rng, 80)
    q = "TTTTTT" + s[:40]  # best path starts at (q=6, s=0)
    qc = swd.codes_batch([q], len(q))
    sc = swd.codes_batch([s], len(s))
    score, qe, se = swd.banded_sw_scores(qc, sc, band=128)
    assert float(score[0]) == 40 * 5.0
    score2, _, _ = swd.sw_pallas(qc, sc, band=128)
    assert float(score2[0]) == 40 * 5.0


def test_sw_pallas_full_matches_gotoh():
    rng = np.random.default_rng(105)
    qs, ss = _cases(rng, 24)
    qc = swd.codes_batch(qs, max(len(q) for q in qs))
    sc = swd.codes_batch(ss, max(len(s) for s in ss))
    score, qe, se = swd.sw_pallas(qc, sc, band=None)
    np.testing.assert_allclose(np.asarray(score), _oracle_scores(qs, ss),
                               rtol=0, atol=1e-4)


def test_sw_banded_pallas_matches_scan():
    # the production banded kernel (band on sublanes, batch on lanes,
    # deferred argmax): scores AND end positions must match the scan twin,
    # including its tie-breaking (earliest row, then lowest band cell)
    rng = np.random.default_rng(107)
    qn = rng.integers(0, 4, (64, 96)).astype(np.int32)
    sn = rng.integers(0, 4, (64, 120)).astype(np.int32)
    for i in range(0, 64, 2):
        sn[i, :96] = qn[i]
    for band in (64, 128):
        s1, q1, e1 = swd.banded_sw_scores(qn, sn, band=band)
        s2, q2, e2 = swd.sw_banded_pallas(qn, sn, band=band)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(q2), np.asarray(q1))
        np.testing.assert_array_equal(np.asarray(e2), np.asarray(e1))


def test_sw_pallas_banded_matches_scan():
    # random junk pairs stress band edges (best paths drift off-diagonal)
    rng = np.random.default_rng(106)
    qn = rng.integers(0, 4, (64, 96)).astype(np.int32)
    sn = rng.integers(0, 4, (64, 120)).astype(np.int32)
    for i in range(0, 64, 2):
        sn[i, :96] = qn[i]
    s1, q1, e1 = swd.banded_sw_scores(qn, sn, band=64)
    s2, q2, e2 = swd.sw_pallas(qn, sn, band=64)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(q1))
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(e1))
