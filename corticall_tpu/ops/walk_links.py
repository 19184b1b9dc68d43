"""Batched link-assisted walks: McCortex link-following on device.

The host LinkStore (traversal/linkstore.py) keeps an unbounded map of active
link elements per walk; here each walk carries a fixed-capacity element table
in device arrays — (choice words, length, position, age, insertion sequence) —
and every step runs the exact store semantics vectorized over B walks:

  1. arriving at a kmer appends its link records (orientation-gated);
  2. at a junction, the oldest elements must agree on the next choice char
     (insertion-ordered tie handling mirrors LinkStore.java:92-144, including
     the quirk that the emitted char comes from the latest element of the
     chosen junction list);
  3. consuming a choice advances matching elements and expires the rest;
  4. ages bump once per junction and once per step that added elements.

Capacity overflows set a per-walk flag so callers can replay those walks on
the host oracle (they are rare; the Java store's live size is small).

A reverse walk equals a forward walk from the reverse complement (the
orientation gating works out to the same condition, and complemented choices
correspond to appending on the rc strand), so one kernel serves assemble()'s
both directions.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import cuckoo as ck
from . import kmer_jax as kj
from .. import kmer as km

CAP = 32                 # active link elements per walk
MAX_J = 32               # junction choices per link record
JW = (MAX_J + 15) // 16  # uint32 words per choice string
MAX_ADD = 16             # link records appended per kmer arrival


@dataclass
class LinkArrays:
    """CSR link pool over graph records (device-resident)."""
    offsets: np.ndarray    # int32[N+1]
    choices: np.ndarray    # uint32[P, JW] (choice j in bits 2*(j%16) of word j//16)
    lengths: np.ndarray    # int32[P]
    forward: np.ndarray    # bool[P]
    truncated: int = 0     # records dropped for exceeding MAX_J


def build_link_arrays(graph, links_list) -> LinkArrays:
    """Pack LinksData records into CSR arrays aligned with graph record order."""
    per_record: dict[int, list] = {}
    truncated = 0
    samples = set(graph.sample_names)
    for lm in links_list:
        if lm.sample_name not in samples:
            continue
        keys = lm.records if hasattr(lm, "records") else lm.index
        for kmer_str in keys:
            rec = graph.find_record(kmer_str)
            if rec < 0:
                continue
            jrs = lm.records[kmer_str] if hasattr(lm, "records") else lm.get(kmer_str)
            for jr in jrs:
                if len(jr.choices) > MAX_J:
                    truncated += 1
                    continue
                per_record.setdefault(rec, []).append(jr)

    n = graph.num_records
    offsets = np.zeros(n + 1, dtype=np.int32)
    pool = []
    for r in range(n):
        offsets[r] = len(pool)
        for jr in per_record.get(r, []):
            words = np.zeros(JW, dtype=np.uint32)
            for j, c in enumerate(jr.choices):
                words[j // 16] |= np.uint32("ACGT".index(c)) << np.uint32(2 * (j % 16))
            pool.append((words, len(jr.choices), jr.forward))
    offsets[n] = len(pool)

    p = max(len(pool), 1)
    choices = np.zeros((p, JW), dtype=np.uint32)
    lengths = np.zeros(p, dtype=np.int32)
    forward = np.zeros(p, dtype=bool)
    for i, (w, l, f) in enumerate(pool):
        choices[i] = w
        lengths[i] = l
        forward[i] = f
    return LinkArrays(offsets, choices, lengths, forward, truncated)


def store_add(el_choices, el_len, el_pos, el_age, el_valid, el_seq,
              seq_counter, overflow, active, flipped,
              rec_choices, rec_len, rec_fw, rec_cnt):
    """Append the current kmer's link records to each walk's element table
    (LinkStore.add semantics, orientation-gated).  rec_* are pre-gathered
    [B, MAX_ADD(, JW)] record blocks — locally gathered on one device, routed
    by all_to_all on a mesh.  Record j (insertion order) maps to the free
    slot of equal rank via a (B, CAP, MAX_ADD) match."""
    b = active.shape[0]
    ma = rec_len.shape[1]
    jj = jax.lax.broadcasted_iota(jnp.int32, (b, ma), 1)
    gate = (jj < jnp.minimum(rec_cnt, MAX_ADD)[:, None]) & active[:, None] \
        & (rec_fw == ~flipped[:, None])
    rank_add = jnp.cumsum(gate.astype(jnp.int32), axis=1) - 1
    free = ~el_valid
    rank_free = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
    num_free = jnp.sum(free.astype(jnp.int32), axis=1)
    assign = (free[:, :, None]
              & gate[:, None, :]
              & (rank_free[:, :, None] == rank_add[:, None, :]))
    filled = jnp.any(assign, axis=2)
    j_for_slot = jnp.argmax(assign, axis=2)
    ch_sel = jnp.take_along_axis(rec_choices, j_for_slot[:, :, None], axis=1)
    ln_sel = jnp.take_along_axis(rec_len, j_for_slot, axis=1)
    el_choices = jnp.where(filled[..., None], ch_sel, el_choices)
    el_len = jnp.where(filled, ln_sel, el_len)
    el_pos = jnp.where(filled, 0, el_pos)
    el_age = jnp.where(filled, 0, el_age)
    el_seq = jnp.where(filled, seq_counter[:, None] + j_for_slot, el_seq)
    el_valid = el_valid | filled
    overflow = overflow | jnp.any(gate & (rank_add >= num_free[:, None]),
                                  axis=1)
    seq_counter = seq_counter + MAX_ADD
    overflow = overflow | (rec_cnt > MAX_ADD)
    return (el_choices, el_len, el_pos, el_age, el_valid, el_seq,
            seq_counter, overflow)


def store_advance(cur, active, el_choices, el_len, el_pos, el_age, el_valid,
                  el_seq, edge, flipped, is_first, k):
    """Successor choice + junction consume + aging (LinkStore steps 2-4 of
    walk_links_forward; shared between the single-device kernel and the
    sharded mesh walk).  Returns (cur, active, el_pos, el_valid, el_age,
    emitted, take_choice)."""
    next_mask = jnp.where(flipped, edge >> 4, edge & 0xF).astype(jnp.uint32)
    n = kj.popcount4(next_mask)
    single_base = kj.lowest_set_base(next_mask)

    exhausted = el_pos >= el_len
    live = el_valid & ~exhausted
    age_masked = jnp.where(live, el_age, -1)
    oldest_age = jnp.max(age_masked, axis=1)
    is_oldest = live & (el_age == oldest_age[:, None]) & (oldest_age[:, None] >= 0)
    chars = _char_at(el_choices, el_pos)
    any_oldest = jnp.any(is_oldest, axis=1)
    first_oldest = jnp.argmax(is_oldest, axis=1)
    rep_char = jnp.take_along_axis(chars, first_oldest[:, None], axis=1)[:, 0]
    agree = jnp.all(~is_oldest | (chars == rep_char[:, None]), axis=1)

    rep_words = jnp.take_along_axis(
        el_choices, first_oldest[:, None, None], axis=1)[:, 0, :]
    same_list = el_valid & jnp.all(el_choices == rep_words[:, None, :], axis=-1)
    seq_masked = jnp.where(same_list, el_seq, -1)
    latest = jnp.argmax(seq_masked, axis=1)
    choice = jnp.take_along_axis(chars, latest[:, None], axis=1)[:, 0]

    have_choice = any_oldest & agree
    choice_ok = have_choice & ((next_mask >> choice) & 1).astype(bool)

    junction = n > 1
    take_single = active & (n == 1)
    take_choice = active & junction & choice_ok & ~is_first
    base = jnp.where(junction, choice, single_base.astype(jnp.uint32))
    advance = take_single | take_choice

    consumed = take_choice
    match = chars == choice[:, None]
    keep = el_valid & match & (el_pos + 1 < el_len)
    el_pos = jnp.where(consumed[:, None] & keep, el_pos + 1, el_pos)
    el_valid = jnp.where(consumed[:, None], keep, el_valid)

    bump = (consumed | (active & junction & ~is_first)).astype(el_age.dtype)
    new_paths = jnp.any(el_valid & (el_age == 0), axis=1)
    bump = bump + (active & new_paths & ~is_first).astype(el_age.dtype)
    el_age = jnp.where(el_valid, el_age + bump[:, None], el_age)

    store_active = jnp.any(el_valid, axis=1)
    nxt = kj.shift_append(cur, base, k)
    cur = jnp.where(advance[:, None], nxt, cur)
    emitted = jnp.where(advance, base.astype(jnp.int8), -1)
    emitted = jnp.where(advance & store_active,
                        emitted | jnp.int8(8), emitted)
    return cur, advance, el_pos, el_valid, el_age, emitted, take_choice


def _char_at(choices, pos):
    """choices [..., JW] uint32, pos [...] int32 -> 2-bit code at pos."""
    word = jnp.take_along_axis(choices, (pos[..., None] // 16), axis=-1)[..., 0]
    return (word >> (2 * (pos % 16)).astype(jnp.uint32)) & 3


@partial(jax.jit, static_argnames=("k", "num_steps"))
def walk_links_forward(buckets, edges_combined, link_off, link_choices,
                       link_len, link_fw, seeds, k: int, num_steps: int):
    """Forward walks with link following.

    buckets: cuckoo table (ops/cuckoo.py) with payload = record index + 1 —
    one stacked gather resolves the record; the edge byte rides a second
    single-byte gather from edges_combined uint8[N].  link_*: LinkArrays
    fields; seeds: uint32[B, W].

    Returns (bases int8[T, B], overflow bool[B], steps int32[B],
    junctions int32[B] — junction advances resolved by a link choice).
    """
    b = seeds.shape[0]
    w = seeds.shape[1]

    def lookup_edge_and_rec(canon):
        pay = ck.lookup_payload(buckets, canon, w)
        rec = pay.astype(jnp.int32) - 1
        edge = jnp.where(rec >= 0,
                         edges_combined[jnp.maximum(rec, 0)], 0).astype(jnp.uint32)
        return edge, rec

    def gather_links(rec):
        """Pre-gather up to MAX_ADD link-record blocks for each walk's
        current record (the local-memory form of what the mesh version routes
        with all_to_all)."""
        off = jnp.where(rec >= 0, link_off[jnp.maximum(rec, 0)], 0)
        cnt = jnp.where(rec >= 0,
                        link_off[jnp.maximum(rec, 0) + 1] - off, 0)
        ma = max(MAX_ADD, 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (rec.shape[0], ma), 1)
        idx = jnp.minimum(off[:, None] + jj, link_choices.shape[0] - 1)
        return link_choices[idx], link_len[idx], link_fw[idx], cnt

    def step(state, _):
        (cur, active, overflow, el_choices, el_len, el_pos, el_age, el_valid,
         el_seq, seq_counter, stepno) = state
        is_first = stepno == 0

        canon, flipped = kj.canonicalize_words(cur, k)
        edge, rec = lookup_edge_and_rec(canon)
        rec_choices, rec_len, rec_fw, rec_cnt = gather_links(rec)

        # -- 1. add links of the current kmer ------------------------------
        # vectorized slot assignment (one block, not an unrolled MAX_ADD loop
        # — the unrolled form made the scan body ~16x larger and blew the XLA
        # compile to minutes on a real chip): record j (insertion order) maps
        # to the free slot of equal rank via a (B, CAP, MAX_ADD) match.
        (el_choices, el_len, el_pos, el_age, el_valid, el_seq, seq_counter,
         overflow) = store_add(
            el_choices, el_len, el_pos, el_age, el_valid, el_seq, seq_counter,
            overflow, active, flipped, rec_choices, rec_len, rec_fw, rec_cnt)

        # -- 2-4. successor choice / junction consume / ages ----------------
        # (the seed step mirrors seek(): successor by degree only, the store
        # is not consulted — TraversalEngine.java:321-335)
        cur, active, el_pos, el_valid, el_age, emitted, take_choice = \
            store_advance(cur, active, el_choices, el_len, el_pos, el_age,
                          el_valid, el_seq, edge, flipped, is_first, k)
        return (cur, active, overflow, el_choices, el_len, el_pos, el_age,
                el_valid, el_seq, seq_counter, stepno + 1), (emitted, take_choice)

    init = (
        seeds,
        jnp.ones(b, bool),
        jnp.zeros(b, bool),
        jnp.zeros((b, CAP, JW), jnp.uint32),
        jnp.zeros((b, CAP), jnp.int32),
        jnp.zeros((b, CAP), jnp.int32),
        jnp.zeros((b, CAP), jnp.int32),
        jnp.zeros((b, CAP), bool),
        jnp.zeros((b, CAP), jnp.int32),
        jnp.zeros(b, jnp.int32),
        jnp.zeros(b, jnp.int32),
    )
    (_, active, overflow, *_), (emitted, junc) = jax.lax.scan(
        step, init, None, length=num_steps)
    steps = (emitted >= 0).sum(axis=0).astype(jnp.int32)
    junctions = junc.sum(axis=0).astype(jnp.int32)
    return emitted, overflow, steps, junctions


def decode_linked_walk(seed: str, emitted: np.ndarray,
                       max_branch_length: int = 75000) -> str:
    """Emitted stream -> extension string with the reference's seen-set rule.

    Each emitted value is -1 (walk ended) or base | (store_active << 3).
    The reference permits revisits while the store is active
    (TraversalEngine.java:262); the device records every advance, and we stop
    where Java would: at the first revisited kmer reached while inactive.
    """
    k = len(seed)
    out = []
    seen: set = set()
    cur = seed
    for v in emitted:
        v = int(v)
        if v < 0:
            break
        base = "ACGT"[v & 3]
        store_active = bool(v & 8)
        nxt = cur[1:] + base
        if nxt in seen and not store_active:
            break
        seen.add(nxt)
        out.append(base)
        cur = nxt
        if len(out) >= max_branch_length:
            break
    return "".join(out)


class LinkedWalker:
    """Reusable device state for link-assisted walks: cuckoo table + link CSR
    built once, then any number of assemble calls (chunked over seeds).

    Construction stays on host numpy (graph.kmers/graph.edges) — no
    device round-trips, which dominate wall-clock over a remote-chip link."""

    def __init__(self, graph, colors, links_list):
        self.k = graph.kmer_size
        kmers = graph.kmers
        ct = ck.build_cuckoo(kmers,
                             np.arange(kmers.shape[0], dtype=np.uint32) + 1)
        edges = np.bitwise_or.reduce(graph.edges[:, list(colors)], axis=1)
        la = build_link_arrays(graph, links_list)
        self.args = (jnp.asarray(ct.buckets),
                     jnp.asarray(edges),
                     jnp.asarray(la.offsets), jnp.asarray(la.choices),
                     jnp.asarray(la.lengths), jnp.asarray(la.forward))
        self.truncated = la.truncated

    def walk_split(self, seeds: list, num_steps: int = 1024,
                   max_branch: int | None = None, chunk: int = 16384):
        """Per-direction link-assisted extensions: returns (fwd_exts,
        back_exts, overflow bool[B], junctions int32[B]).  num_steps sets the
        (bucketable) device walk length; max_branch bounds the decoded
        extension (TraversalEngineConfiguration.maxBranchLength semantics)."""
        k = self.k
        mb = max_branch if max_branch is not None else num_steps
        fwd_exts: list = []
        back_exts: list = []
        overflow = np.zeros(len(seeds), dtype=bool)
        junctions = np.zeros(len(seeds), dtype=np.int32)
        for lo in range(0, len(seeds), chunk):
            part = seeds[lo:lo + chunk]
            rc_strs = [km.revcomp(s) for s in part]
            fwd = jnp.asarray(km.pack_codes(km.strings_to_codes(part), k))
            rev = jnp.asarray(km.pack_codes(km.strings_to_codes(rc_strs), k))
            fe, fo, _, fj = walk_links_forward(*self.args, fwd, k, num_steps)
            re_, ro, _, rj = walk_links_forward(*self.args, rev, k, num_steps)
            fe = np.asarray(fe).T
            re_ = np.asarray(re_).T
            overflow[lo:lo + len(part)] = np.asarray(fo) | np.asarray(ro)
            junctions[lo:lo + len(part)] = np.asarray(fj) + np.asarray(rj)
            for i, seed in enumerate(part):
                fwd_exts.append(decode_linked_walk(seed, fe[i], mb))
                back_exts.append(decode_linked_walk(rc_strs[i], re_[i], mb))
        return fwd_exts, back_exts, overflow, junctions

    def assemble(self, seeds: list, num_steps: int = 1024, chunk: int = 16384):
        """Bidirectional link-assisted contigs (TraversalEngine.assemble with
        links).  Returns (contigs, overflow bool[B], junctions int32[B])."""
        k = self.k
        contigs: list = []
        overflow = np.zeros(len(seeds), dtype=bool)
        junctions = np.zeros(len(seeds), dtype=np.int32)
        for lo in range(0, len(seeds), chunk):
            part = seeds[lo:lo + chunk]
            rc_strs = [km.revcomp(s) for s in part]
            fwd = jnp.asarray(km.pack_codes(km.strings_to_codes(part), k))
            rev = jnp.asarray(km.pack_codes(km.strings_to_codes(rc_strs), k))
            fe, fo, _, fj = walk_links_forward(*self.args, fwd, k, num_steps)
            re_, ro, _, rj = walk_links_forward(*self.args, rev, k, num_steps)
            fe = np.asarray(fe).T
            re_ = np.asarray(re_).T
            overflow[lo:lo + len(part)] = np.asarray(fo) | np.asarray(ro)
            junctions[lo:lo + len(part)] = np.asarray(fj) + np.asarray(rj)
            for i, seed in enumerate(part):
                fwd_ext = decode_linked_walk(seed, fe[i], num_steps)
                back_ext = decode_linked_walk(rc_strs[i], re_[i], num_steps)
                prefix = km.revcomp(back_ext) if back_ext else ""
                contigs.append(prefix + seed + fwd_ext)
        return contigs, overflow, junctions


def assemble_batch_links(graph, colors, links_list, seeds: list,
                         num_steps: int = 1024):
    """One-shot convenience wrapper over LinkedWalker (contigs, overflow)."""
    walker = LinkedWalker(graph, colors, links_list)
    contigs, overflow, _ = walker.assemble(seeds, num_steps)
    return contigs, overflow
