"""Device Tesserae vs host oracle: segment-level equivalence."""

import numpy as np
import pytest

from corticall_tpu.models.tesserae import Tesserae
from corticall_tpu.ops.tesserae_jax import TesseraeDevice


def _genome(rng, n):
    return "".join(rng.choice(list("ACGT"), n))


def _segments(ps):
    return [(name, track.replace(" ", "").upper(), se) for name, track, se in ps]


def _assert_equivalent(dev, host, tol=1):
    """Same mosaic structure: segment names in order, boundaries within tol
    (the device runs float32; a recombination point inside an ambiguous
    overlap where the junction base matches both templates may legitimately
    shift by a base), and identical reconstructed query."""
    assert dev[0][1].replace("-", "") == host[0][1].replace("-", "")
    assert len(dev) == len(host)
    for (dn, _, (da, db)), (hn, _, (ha, hb)) in zip(dev[1:], host[1:]):
        assert dn == hn
        assert abs(da - ha) <= tol and abs(db - hb) <= tol


def test_device_matches_host_small():
    targets = {
        "template0": "GTAGGCGAGTCCCGTTTATA",
        "template1": "CCACAGAAGATGACGCCATT",
    }
    query = "GTAGGCGAGATGACGCCAT"
    host = Tesserae().align(query, targets)
    dev = TesseraeDevice().align(query, targets)
    _assert_equivalent(dev, host)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host_recombinant(seed):
    rng = np.random.default_rng(seed)
    t0, t1 = _genome(rng, 400), _genome(rng, 400)
    query = t0[:150] + t1[150:280] + t0[280:399]
    host = Tesserae().align(query, {"t0": t0, "t1": t1})
    dev = TesseraeDevice().align(query, {"t0": t0, "t1": t1})
    _assert_equivalent(dev, host)


def test_device_matches_host_with_indels():
    rng = np.random.default_rng(5)
    t = _genome(rng, 300)
    query = t[:100] + t[103:205] + "GGGG" + t[205:299]
    host = Tesserae().align(query, {"t0": t})
    dev = TesseraeDevice().align(query, {"t0": t})
    _assert_equivalent(dev, host)


def test_device_llk_close_to_host():
    rng = np.random.default_rng(6)
    t = _genome(rng, 200)
    query = t[:80] + t[90:199]
    host = Tesserae()
    dev = TesseraeDevice()
    host.align(query, {"t0": t})
    dev.align(query, {"t0": t})
    assert abs(host.llk - dev.llk) / abs(host.llk) < 1e-4
