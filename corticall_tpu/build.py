"""Graph construction from reads — the in-framework McCortex replacement.

The reference pipeline shells out to mccortex (`build -k -S`, `clean`,
`inferedges`, `thread`; cromwell/wdl/Simulate.wdl:620-713) — external C
binaries.  Here graph building is native to the framework and fully
vectorized: 2-bit pack every read, canonicalize every window, radix-sort the
packed kmers, segment-reduce coverage and OR-reduce edge masks.  The same
sorted-unique machinery runs on device for large inputs (np ops map 1:1 onto
jnp).

Link threading (`thread`) replays reads through the built graph and emits
junction-choice records (io/links.py fixture semantics, which mirror
TempLinksAssembler / McCortex ctp output).
"""

from __future__ import annotations

import numpy as np

from . import graph as gr
from . import kmer as km
from .io import links as lkio


def count_kmers(sequences, k: int, chunk_bases: int = 8_000_000):
    """Iterate sequences once, returning (sorted unique canonical kmers
    uint32[N, W], coverage uint32[N], in_mask uint8[N], out_mask uint8[N])."""
    w = km.words_per_kmer(k)
    acc_keys = np.zeros(0, dtype=f"|S{8 * km.containers_per_kmer(k)}")
    acc_cov = np.zeros(0, dtype=np.uint64)
    acc_in = np.zeros(0, dtype=np.uint8)
    acc_out = np.zeros(0, dtype=np.uint8)

    def flush(batch_keys, batch_in, batch_out):
        nonlocal acc_keys, acc_cov, acc_in, acc_out
        if not batch_keys:
            return
        keys = np.concatenate(batch_keys)
        in_m = np.concatenate(batch_in)
        out_m = np.concatenate(batch_out)
        order = np.argsort(keys, kind="stable")
        keys, in_m, out_m = keys[order], in_m[order], out_m[order]
        uniq, start, counts = np.unique(keys, return_index=True, return_counts=True)
        cov = counts.astype(np.uint64)
        im = np.bitwise_or.reduceat(in_m, start)
        om = np.bitwise_or.reduceat(out_m, start)
        # merge with accumulator
        merged = np.concatenate([acc_keys, uniq])
        morder = np.argsort(merged, kind="stable")
        mkeys = merged[morder]
        mcov = np.concatenate([acc_cov, cov])[morder]
        mim = np.concatenate([acc_in, im])[morder]
        mom = np.concatenate([acc_out, om])[morder]
        uniq2, start2 = np.unique(mkeys, return_index=True)
        end2 = np.append(start2[1:], len(mkeys))
        acc_keys = uniq2
        acc_cov = np.add.reduceat(mcov, start2)
        acc_in = np.bitwise_or.reduceat(mim, start2)
        acc_out = np.bitwise_or.reduceat(mom, start2)
        # guard reduceat single-segment semantics
        assert len(acc_cov) == len(uniq2)

    batch_keys, batch_in, batch_out = [], [], []
    pending = 0
    for seq in sequences:
        if len(seq) < k:
            continue
        codes = km.string_to_codes_permissive(seq)
        # split on non-ACGT bases
        breaks = np.nonzero(codes > 3)[0]
        segments = []
        prev = 0
        for b in breaks:
            if b - prev >= k:
                segments.append(codes[prev:b])
            prev = b + 1
        if len(codes) - prev >= k:
            segments.append(codes[prev:])
        for seg in segments:
            windows = km.kmerize_codes(seg, k)
            m = windows.shape[0]
            canon, flipped = km.canonicalize_codes(windows)
            keys = km.words_to_bytes_be(km.pack_codes(canon, k), k)

            prev_base = np.full(m, -1, dtype=np.int16)
            next_base = np.full(m, -1, dtype=np.int16)
            prev_base[1:] = seg[:m - 1]
            next_base[:-1] = seg[k:]
            in_mask = np.zeros(m, dtype=np.uint8)
            out_mask = np.zeros(m, dtype=np.uint8)
            has_prev, has_next = prev_base >= 0, next_base >= 0
            fwd = ~flipped
            in_mask |= np.where(fwd & has_prev, (1 << np.maximum(prev_base, 0)).astype(np.uint8), 0)
            out_mask |= np.where(fwd & has_next, (1 << np.maximum(next_base, 0)).astype(np.uint8), 0)
            in_mask |= np.where(flipped & has_next, (1 << (3 - np.maximum(next_base, 0))).astype(np.uint8), 0)
            out_mask |= np.where(flipped & has_prev, (1 << (3 - np.maximum(prev_base, 0))).astype(np.uint8), 0)

            batch_keys.append(keys)
            batch_in.append(in_mask)
            batch_out.append(out_mask)
            pending += m
        if pending >= chunk_bases:
            flush(batch_keys, batch_in, batch_out)
            batch_keys, batch_in, batch_out = [], [], []
            pending = 0
    flush(batch_keys, batch_in, batch_out)

    kmers = km.bytes_be_to_words(acc_keys, k) if len(acc_keys) else np.zeros((0, w), np.uint32)
    return kmers, np.minimum(acc_cov, 0xFFFFFFFF).astype(np.uint32), acc_in, acc_out


def build_graph_from_reads(sequences, k: int, sample_name: str,
                           use_native: bool = True) -> gr.CortexGraph:
    """`mccortex build -k <k> -S` equivalent: reads -> sorted 1-color graph.

    Uses the C++ native counting core (native.py) when available; falls back
    to the vectorized numpy path."""
    result = None
    if use_native and k <= 64:
        from . import native
        sequences = list(sequences)
        result = native.count_kmers_native(sequences, k)
    if result is None:
        result = count_kmers(sequences, k)
    kmers, cov, in_m, out_m = result
    edges = (gr.rev4(in_m).astype(np.uint8) << np.uint8(4)) | out_m
    return gr.from_arrays([sample_name], k, kmers, np.asarray(cov)[:, None],
                          edges[:, None])


def clean_graph(g: gr.CortexGraph, min_coverage: int = 2,
                tip_length: int | None = None) -> gr.CortexGraph:
    """`mccortex clean` equivalent (simplified): drop kmers below a coverage
    threshold, then clip short dead-end tips (chains anchored on one side only
    and shorter than tip_length, default 2k)."""
    from .commands.core import subset_colors
    tip_length = tip_length or 2 * g.kmer_size

    keep = g.coverages[:, 0] >= min_coverage
    g2 = subset_colors(g, [0], keep)
    g2 = infer_edges(g2, restrict=True)

    # tip clipping: iteratively remove short chains with a free end
    changed = True
    while changed:
        changed = False
        e = g2.edges[:, 0].astype(np.uint16)
        in_deg = np.zeros(g2.num_records, np.int8)
        out_deg = np.zeros(g2.num_records, np.int8)
        for b in range(4):
            in_deg += ((e >> (4 + b)) & 1).astype(np.int8)
            out_deg += ((e >> b) & 1).astype(np.int8)
        free_end = (in_deg == 0) | (out_deg == 0)
        # find chain lengths from free ends (host walk; tips are short)
        drop = np.zeros(g2.num_records, dtype=bool)
        for i in np.nonzero(free_end)[0]:
            if drop[i]:
                continue
            chain = [int(i)]
            cur = g2.kmer_string(i)
            forward = in_deg[i] == 0
            while len(chain) <= tip_length:
                rec = g2.find_record(cur)
                canon = g2.kmer_string(rec)
                flipped = canon != cur
                pm, nm = gr.edges_to_masks(np.uint8(g2.edges[rec, 0]), flipped)
                mask = int(nm if forward else pm)
                if bin(mask).count("1") != 1:
                    break
                b = (mask & -mask).bit_length() - 1
                cur = (cur[1:] + "ACGT"[b]) if forward else ("ACGT"[b] + cur[:-1])
                nrec = g2.find_record(cur)
                if nrec < 0:
                    break
                # stop at a junction vertex (belongs to the trunk)
                ncanon = g2.kmer_string(nrec)
                nflip = ncanon != cur
                npm, nnm = gr.edges_to_masks(np.uint8(g2.edges[nrec, 0]), nflip)
                back_deg = bin(int(npm if forward else nnm)).count("1")
                if back_deg > 1:
                    break
                chain.append(nrec)
            if len(chain) <= tip_length and len(chain) < g2.num_records:
                # only clip if the chain really ends free on the far side too
                # or is attached to a junction (standard tip definition)
                if len(chain) < tip_length:
                    for r in chain:
                        drop[r] = True
                    changed = True
        if changed:
            g2 = subset_colors(g2, [0], ~drop)
            g2 = infer_edges(g2, restrict=True)
    return g2


def infer_edges(g: gr.CortexGraph, restrict: bool = False) -> gr.CortexGraph:
    """`mccortex inferedges` equivalent: set an edge bit wherever both adjacent
    kmers exist in the graph (restrict=True instead CLEARS bits pointing at
    absent kmers, used after cleaning)."""
    k = g.kmer_size
    n = g.num_records
    if n == 0:
        return g
    codes = km.unpack_words(g.kmers, k)          # canonical orientation codes
    new_edges = g.edges.copy()
    for c in range(g.num_colors):
        present = g.coverages[:, c] > 0
        in_mask = np.zeros(n, dtype=np.uint8)
        out_mask = np.zeros(n, dtype=np.uint8)
        for b in range(4):
            nxt = np.concatenate([codes[:, 1:], np.full((n, 1), b, np.uint8)], axis=1)
            canon_n, _ = km.canonicalize_codes(nxt)
            idx = g.find_records(km.pack_codes(canon_n, k))
            ok = (idx >= 0) & present & (g.coverages[np.maximum(idx, 0), c] > 0)
            out_mask |= np.where(ok, np.uint8(1 << b), 0).astype(np.uint8)
            prv = np.concatenate([np.full((n, 1), b, np.uint8), codes[:, :-1]], axis=1)
            canon_p, _ = km.canonicalize_codes(prv)
            idx = g.find_records(km.pack_codes(canon_p, k))
            ok = (idx >= 0) & present & (g.coverages[np.maximum(idx, 0), c] > 0)
            in_mask |= np.where(ok, np.uint8(1 << b), 0).astype(np.uint8)
        inferred = (gr.rev4(in_mask).astype(np.uint8) << np.uint8(4)) | out_mask
        if restrict:
            new_edges[:, c] = g.edges[:, c] & inferred
        else:
            new_edges[:, c] = g.edges[:, c] | inferred
    out = gr.CortexGraph(type(g.data)(g.header, g.kmers, g.coverages, new_edges,
                                      g.data.kmer_bytes))
    return out


def thread_reads(g: gr.CortexGraph, sequences, sample_name: str) -> lkio.LinksData:
    """`mccortex thread` equivalent: emit link annotations from reads."""
    seqs = {sample_name: list(sequences)}
    return lkio.build_links(g, seqs, sample_name)
