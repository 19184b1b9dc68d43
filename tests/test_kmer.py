"""K-mer primitive tests (parity: CanonicalKmerTest, CortexGraphTest codec tests)."""

import numpy as np
import pytest

from corticall_tpu import kmer as km


def _rc_str(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def test_revcomp():
    assert km.revcomp("ACGT") == "ACGT"
    assert km.revcomp("AATG") == "CATT"
    assert km.revcomp("GATTACA") == "TGTAATC"


@pytest.mark.parametrize("s,canon,flipped", [
    ("AAT", "AAT", False),
    ("ATT", "AAT", True),
    ("ACGT", "ACGT", False),   # palindrome: not flipped
    ("TTTCG", "CGAAA", True),
    ("CGAAA", "CGAAA", False),
])
def test_canonical(s, canon, flipped):
    got, f = km.canonical_kmer(s)
    assert got == canon
    assert f == flipped


def test_canonical_matches_string_min():
    rng = np.random.default_rng(0)
    for k in (3, 5, 16, 17, 31, 32, 33, 47, 63):
        seqs = ["".join(rng.choice(list("ACGT"), k)) for _ in range(50)]
        codes = km.strings_to_codes(seqs)
        canon, flipped = km.canonicalize_codes(codes)
        for i, s in enumerate(seqs):
            expect = min(s, _rc_str(s))
            assert km.codes_to_string(canon[i]) == expect
            assert bool(flipped[i]) == (expect != s)


def test_pack_roundtrip():
    rng = np.random.default_rng(1)
    for k in (3, 15, 16, 17, 32, 33, 47, 63):
        codes = rng.integers(0, 4, size=(40, k)).astype(np.uint8)
        words = km.pack_codes(codes)
        assert words.shape == (40, km.words_per_kmer(k))
        back = km.unpack_words(words, k)
        np.testing.assert_array_equal(back, codes)


def test_packed_order_is_lexicographic():
    rng = np.random.default_rng(2)
    for k in (5, 31, 47):
        seqs = sorted("".join(rng.choice(list("ACGT"), k)) for _ in range(100))
        words = km.pack_codes(km.strings_to_codes(seqs))
        keys = km.words_to_bytes_be(words, k)
        assert list(keys) == sorted(keys)


def test_bytes_be_roundtrip():
    rng = np.random.default_rng(3)
    for k in (5, 16, 40, 47, 63):
        codes = rng.integers(0, 4, size=(20, k)).astype(np.uint8)
        words = km.pack_codes(codes)
        raw = km.words_to_bytes_be(words, k)
        assert raw.dtype == np.dtype(f"|S{8 * km.containers_per_kmer(k)}")
        back = km.bytes_be_to_words(raw, k)
        np.testing.assert_array_equal(back, words)


def test_ctx_spec_binary_kmer_example():
    # spec (docs/ctx_spec.md): lowest-order bit of the last uint64 is the
    # second bit of the last kmer letter; letters right-aligned.
    # "ACGT" -> 0b00011011 = 0x1b in the low byte.
    words = km.pack_codes(km.string_to_codes("ACGT"))
    raw = km.words_to_bytes_be(words, 4)
    assert bytes(raw.item() if hasattr(raw, "item") else raw) == b"\x00" * 7 + b"\x1b"
