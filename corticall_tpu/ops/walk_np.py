"""Numpy twin of the batched walk kernel for small batches.

The device kernel (ops/cuckoo.py::walk_forward_cuckoo) pays a one-time XLA
compile that is only worth it for large frontiers; for small batches
(Partition's few thousand ROI walks) this vectorized numpy walk produces the
IDENTICAL output stream — same emitted bases, Brent cycle flags, and step
counts — with zero compile cost, using the graph's sorted-key lookup
(searchsorted) instead of a hash table.  Same reference semantics
(TraversalEngine.java:241-279 single-successor walk).
"""

from __future__ import annotations

import numpy as np

from .. import graph as gr
from .. import kmer as km

_POP4 = np.array([bin(i).count("1") for i in range(16)], dtype=np.int8)
_LOW4 = np.array([(i & -i).bit_length() - 1 if i else 0 for i in range(16)],
                 dtype=np.int8)


def walk_forward_np(graph: gr.CortexGraph, colors, seed_codes: np.ndarray,
                    num_steps: int):
    """seed_codes: uint8[B, k] walk-orientation kmer codes.

    Returns (bases int8[T, B], cycled bool[B], steps int32[B]) — bit-identical
    to walk_forward_cuckoo on the same graph/colors/seeds.
    """
    b, k = seed_codes.shape
    cols = list(colors)
    edges = graph.edges[:, cols[0]].copy()
    for c in cols[1:]:
        edges |= graph.edges[:, c]

    cur = seed_codes.astype(np.uint8)
    active = np.ones(b, dtype=bool)
    saved = cur.copy()
    power = np.ones(b, dtype=np.int32)
    lam = np.zeros(b, dtype=np.int32)
    bases = np.full((num_steps, b), -1, dtype=np.int8)
    cycles = np.zeros(b, dtype=bool)

    for t in range(num_steps):
        if not active.any():
            break
        canon, flipped = km.canonicalize_codes(cur)
        idx = graph.find_records(km.pack_codes(canon, k))
        e = np.where(idx >= 0, edges[np.maximum(idx, 0)], 0).astype(np.uint8)
        next_mask = np.where(flipped, e >> 4, e & 0xF).astype(np.int64)
        n = _POP4[next_mask]
        base = _LOW4[next_mask]
        nxt = np.concatenate([cur[:, 1:], base[:, None].astype(np.uint8)],
                             axis=1)

        single = n == 1
        is_cycle = (nxt == saved).all(axis=1) & single & active
        advance = active & single & ~is_cycle
        bases[t] = np.where(advance, base, -1).astype(np.int8)
        cycles |= is_cycle

        teleport = (power == lam) & advance
        saved = np.where(teleport[:, None], nxt, saved)
        power = np.where(teleport, power * 2, power)
        lam = np.where(teleport, 0, lam)
        lam = np.where(advance, lam + 1, lam)

        cur = np.where(advance[:, None], nxt, cur)
        active = advance

    steps = (bases >= 0).sum(axis=0).astype(np.int32)
    return bases, cycles, steps


def decode_runs(w0: np.ndarray, w1: np.ndarray) -> np.ndarray:
    """Unpack one walk's run-word columns (uint32[T] each, from
    cuckoo.walk_forward_runs) into an int8 base-code array in emission order.
    word0 bits 29..24 = run length m; bases are big-endian 2-bit fields —
    b0..b11 in word0 bits 23..0, b12..b23 in word1 bits 23..0."""
    w0 = np.asarray(w0, dtype=np.uint64)
    w1 = np.asarray(w1, dtype=np.uint64)
    m = ((w0 >> 24) & 0x3F).astype(np.int64)
    # 48-bit field per iteration, b0 at bits 47..46
    f = ((w0 & 0xFFFFFF) << 24) | (w1 & 0xFFFFFF)
    total = int(m.sum())
    starts = np.concatenate([[0], np.cumsum(m)[:-1]])
    t_idx = np.repeat(np.arange(len(m)), m)
    j_idx = np.arange(total) - starts[t_idx]            # 0..m-1 within run
    out = ((f[t_idx] >> (46 - 2 * j_idx).astype(np.uint64)) & 0x3).astype(np.int8)
    return out


_JUMP_FIELD_SHIFTS = (30 - 2 * np.arange(16)).astype(np.uint32)


def decode_jump_packed(words: np.ndarray, steps: int) -> np.ndarray:
    """One lane's jump-walk emission (cuckoo.walk_forward_jumps packed
    row: [h0, l0, h1, l1, ...], base p of each word at bits 30-2p) ->
    int8[steps] base codes."""
    w = np.asarray(words, dtype=np.uint32)
    fields = (w[:, None] >> _JUMP_FIELD_SHIFTS[None, :]) & 3
    return fields.reshape(-1).astype(np.int8)[:steps]


def replay_jump_walk(seed: str, words: np.ndarray, steps: int,
                     max_branch_length: int = 75000) -> str:
    """Exact walk extension from a jump-kernel packed recording (seen-set
    replay — see replay_run_walk)."""
    return replay_walk(seed, decode_jump_packed(words, steps), True,
                       max_branch_length)


_BASE_LUT = np.frombuffer(b"ACGT", dtype=np.uint8)


_REVISIT_POWERS: dict = {}


def _has_revisit(seed: str, codes: np.ndarray, k: int) -> bool:
    """True when the walk-oriented kmer cursor revisits any position along
    seed+ext — the only case where the raw recording differs from the
    seen-set oracle.  Vectorized polynomial hash over all windows; a hash
    collision only costs a spurious dict replay (safe)."""
    from .. import kmer as km
    seed_codes = km.string_to_codes_permissive(seed)
    path = np.concatenate([seed_codes, codes.astype(np.uint8)])
    wins = km.kmerize_codes(path, k)
    p = _REVISIT_POWERS.get(k)
    if p is None:
        mult = np.uint64(0x9E3779B97F4A7C15)
        p = np.empty(k, np.uint64)
        p[0] = 1
        for i in range(1, k):
            p[i:i + 1] = p[i - 1:i] * mult
        _REVISIT_POWERS[k] = p
    h = (wins.astype(np.uint64) * p[None, :]).sum(axis=1, dtype=np.uint64)
    return len(np.unique(h)) != len(h)


def jump_extensions_batch(seeds: list, packed: np.ndarray, steps: np.ndarray,
                          cycled: np.ndarray, saturated: np.ndarray,
                          max_branch_length: int = 75000) -> list:
    """All lanes' extensions from one walk_forward_jumps result, decoded in
    one vectorized pass.  Linear recordings convert straight to strings.
    Saturated (cap-length) lanes are almost always genuinely linear — a
    vectorized revisit check proves it; only lanes with an actual cursor
    revisit (true cycles) pay the per-kmer seen-set replay."""
    w = np.asarray(packed, dtype=np.uint32)
    out = []
    # decode in bounded lane blocks: the [B, 2T, 16] expansion at the
    # production chunk (65536 lanes x max_walk 20000) would be a ~1.3 GB
    # uint8 transient (with a >5 GB uint32 intermediate) — blocks keep the
    # peak under ~100 MB with identical output (ADVICE r04)
    block = max(1, (16 << 20) // max(w.shape[1] * 16, 1))
    for lo in range(0, len(seeds), block):
        wb = w[lo:lo + block]
        fields = ((wb[:, :, None] >> _JUMP_FIELD_SHIFTS[None, None, :]) & 3
                  ).astype(np.uint8)
        flat = fields.reshape(wb.shape[0], -1)
        for j, seed in enumerate(seeds[lo:lo + block]):
            i = lo + j
            n = int(steps[i])
            codes = flat[j, :n]
            if cycled[i] or (saturated[i]
                             and _has_revisit(seed, codes, len(seed))):
                out.append(replay_walk(seed, codes.astype(np.int8), True,
                                       max_branch_length))
            else:
                out.append(_BASE_LUT[codes].tobytes().decode())
    return out


def replay_run_walk(seed: str, w0: np.ndarray, w1: np.ndarray,
                    max_branch_length: int = 75000) -> str:
    """Exact walk extension from a run-kernel recording.

    The run kernel's recorded path always covers at least one full lap of any
    cycle (jump-granularity Brent + builder-flagged short cycles, see
    cuckoo.walk_forward_runs), but its stopping point differs from the
    single-step kernel's; applying the reference's seen-set rule to the
    recorded successor map (replay_walk's cycled path) yields the oracle
    answer in every case — including capped walks with undetected revisits."""
    bases = decode_runs(w0, w1)
    return replay_walk(seed, bases, True, max_branch_length)


def dedup_extension(seed: str, ext: str,
                    max_branch_length: int = 75000) -> str:
    """Apply the reference seen-set rule to an extension assembled across
    multiple growing-round chunks (commands/core._batched_contigs): each
    chunk replays with only its own seen state, so a cycle longer than one
    chunk can contribute up to an extra lap before Brent catches it.  One
    final whole-extension replay restores the host-oracle answer."""
    if not ext:
        return ext
    codes = km.string_to_codes_permissive(ext).astype(np.int8)
    if not _has_revisit(seed, codes, len(seed)):
        return ext
    return replay_walk(seed, codes, True, max_branch_length)


def replay_walk(seed: str, bases: np.ndarray, cycled: bool,
                max_branch_length: int = 75000) -> str:
    """Rebuild the walked extension with the reference's exact stopping rule.

    Without links the single-successor function is deterministic per kmer, so
    the device recording (which may overshoot around a cycle before Brent
    detection, or stop slightly early) fully determines the successor map; we
    replay the reference's seen-set semantics (TraversalEngine.java:241-279:
    emit the cursor kmer, then stop when the *following* kmer was already
    stepped onto — the seed and first step are never in the seen set) over
    that map.  Returns the extension string appended after the seed.
    """
    k = len(seed)
    arr = np.asarray(bases)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    codes = arr[arr >= 0]
    ext = lut[codes].tobytes().decode()
    if not cycled:
        # cap-saturated recordings may hide an undetected revisit (kernel
        # Brent's power-of-two windows can miss a cycle of length L until
        # ~2^ceil(log2 L)+L steps; ADVICE r03 / jump-cycle audit) — but the
        # expensive per-kmer seen-set replay only matters when a revisit
        # actually exists, so a vectorized hash-uniqueness check gates it
        # (every chunk-capped walk paying the dict replay cost the r4
        # flagship prefilter 9x its r3 wall-clock before this gate).
        if len(ext) < max_branch_length:
            return ext
        if not _has_revisit(seed, codes, k):
            return ext

    # successor map from the recorded path (covers the full cycle: Brent's
    # anchor sits on the cycle for >= one full lap before detection)
    seq = seed + ext
    succ: dict[str, str] = {}
    for i in range(len(seq) - k):
        succ.setdefault(seq[i:i + k], seq[i + k])

    out = []
    seen: set[str] = set()
    nxt = seed[1:] + succ[seed] if seed in succ else None
    while nxt is not None and len(out) < max_branch_length:
        out.append(nxt[-1])
        b = succ.get(nxt)
        f = nxt[1:] + b if b is not None else None
        if f is not None and f not in seen:
            seen.add(f)
            nxt = f
        else:
            nxt = None
    return "".join(out)
