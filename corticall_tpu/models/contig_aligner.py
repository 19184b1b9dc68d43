"""Whole-contig aligner — the lastz replacement (LastzAligner.java:15-29).

The reference shells out to lastz for whole-contig placements in NAHR
analyses.  Here the same role is a production command (AlignContigs) built
on the framework's own stack: exact-seed chaining (IndexedReference) picks
candidate windows per contig, the batched banded Smith-Waterman device
kernel (ops/sw_device.sw_banded_pallas — band rides sublanes, batch rides
lanes) scores EVERY candidate of EVERY contig in a handful of dispatches,
and only each contig's winning candidates are Gotoh-tracebacked on the
host for cigars.  One device dispatch scores thousands of windows, so the
per-dispatch tunnel latency amortizes — the regime where the device kernel
beats per-pair host DP outright (BENCH: 21.7 GCUPS at 8192x1024, band 128).

Falls back to the pure-host path (ir.align per contig) off-TPU.
"""

from __future__ import annotations

import numpy as np

from .. import kmer as km


# the single compiled device shape (see align_contigs step 2) and the
# minimum batch that amortizes a dispatch through the tunnel
DEV_Q = 4096
DEV_S = 8192
DEV_BAND = 512
MIN_DEVICE_BATCH = 8


def _device_ok() -> bool:
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def align_contigs(queries: dict, references: dict, band: int = 512,
                  max_chains: int = 8, use_device: bool | None = None,
                  stats: dict | None = None) -> dict:
    """{query_name: [Alignment...]} per contig across ALL references.

    queries: {name: sequence}; references: {ref_name: IndexedReference}.
    band: SW band for both the device pre-score and the host window
    extension (512 = the lastz-class whole-contig configuration).
    """
    if use_device is None:
        use_device = _device_ok()

    # 1. seed-chain candidates per (query, reference)
    cand: dict = {qn: [] for qn in queries}
    for qn, qseq in queries.items():
        for rn, ir in references.items():
            for name, neg, r0, window in ir.candidate_windows(
                    qseq, max_chains=max_chains, band=band):
                cand[qn].append((ir, rn, name, neg, r0, window))

    # 2. batched device pre-score at ONE fixed shape: every distinct
    # XLA/Mosaic program costs a compile through the remote AOT tunnel, so
    # all candidates pad into a single (DEV_Q, DEV_S) bucket — one compile
    # per process, then each batch is one dispatch.  Engaged only when the
    # batch is big enough to amortize the dispatch and every window fits;
    # per query only candidates within drop_ratio of its device-best go to
    # host traceback.
    survivors: dict = {qn: list(range(len(cand[qn]))) for qn in cand}
    n_scored = 0
    items = [(qn, ci) for qn in cand for ci in range(len(cand[qn]))
             if len(cand[qn]) > 1]
    fits = items and all(len(queries[qn]) <= DEV_Q
                         and len(cand[qn][ci][5]) <= DEV_S
                         for qn, ci in items)
    if use_device and fits and len(items) >= MIN_DEVICE_BATCH:
        from ..ops import sw_device as swd
        import jax.numpy as jnp

        qs_list, ws_list = [], []
        for qn, ci in items:
            ir, rn, name, neg, r0, window = cand[qn][ci]
            qseq = queries[qn]
            qs_list.append(km.revcomp(qseq) if neg else qseq)
            ws_list.append(window)
        qcodes = swd.codes_batch(qs_list, DEV_Q)
        wcodes = swd.codes_batch(ws_list, DEV_S)
        sc, _, _ = swd.sw_banded_pallas(
            jnp.asarray(qcodes), jnp.asarray(wcodes), band=DEV_BAND)
        sc = np.asarray(sc)
        n_scored = len(items)
        scores = {key: float(s) for key, s in zip(items, sc)}
        for qn in cand:
            if len(cand[qn]) <= 1:
                continue
            ss = [scores.get((qn, ci), 0.0)
                  for ci in range(len(cand[qn]))]
            best = max(ss) if ss else 0.0
            keep = [ci for ci, s in enumerate(ss) if s >= 0.8 * best]
            # length-aware guard: final ranking is by alignment LENGTH
            # desc then NM asc (rank/sortAlignments parity), so a long,
            # diverged placement (the one a mosaic/NAHR contig needs) must
            # not be pruned just because a short exact repeat hit out-scores
            # it — also keep any candidate whose window span exceeds the
            # longest score-surviving window
            max_span = max((len(cand[qn][ci][5]) for ci in keep), default=0)
            keep += [ci for ci in range(len(cand[qn]))
                     if ci not in keep and len(cand[qn][ci][5]) > max_span]
            survivors[qn] = sorted(keep)

    # 3. host traceback of the surviving candidates only
    out: dict = {}
    for qn in cand:
        alignments = []
        for ci in survivors[qn]:
            ir, rn, name, neg, r0, window = cand[qn][ci]
            a = ir.extend_window(queries[qn], name, neg, r0, window)
            if a is not None:
                a.reference = rn
                alignments.append(a)
        if alignments:
            type(next(iter(references.values()))).rank(alignments)
        out[qn] = alignments
    if stats is not None:
        stats["device_scored_windows"] = n_scored
        stats["host_tracebacks"] = sum(len(v) for v in survivors.values())
    return out
