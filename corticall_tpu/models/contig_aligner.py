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

    # 2. batched device pre-score: one kernel invocation per shape bucket
    # scores every candidate window; per query only candidates within
    # drop_ratio of its device-best go to host traceback
    survivors: dict = {qn: list(range(len(cand[qn]))) for qn in cand}
    n_scored = 0
    if use_device:
        from ..ops import sw_device as swd
        import jax.numpy as jnp

        items = [(qn, ci) for qn in cand for ci in range(len(cand[qn]))
                 if len(cand[qn]) > 1]
        if items:
            def bucket(n, lo=256):
                b = lo
                while b < n:
                    b *= 2
                return b

            by_shape: dict = {}
            for qn, ci in items:
                qlen = len(queries[qn])
                wlen = len(cand[qn][ci][5])
                by_shape.setdefault((bucket(qlen), bucket(wlen)),
                                    []).append((qn, ci))
            scores: dict = {}
            for (qb, wb), group in by_shape.items():
                qs_list, ws_list = [], []
                for qn, ci in group:
                    ir, rn, name, neg, r0, window = cand[qn][ci]
                    qseq = queries[qn]
                    qs_list.append(km.revcomp(qseq) if neg else qseq)
                    ws_list.append(window)
                qcodes = swd.codes_batch(qs_list, qb)
                wcodes = swd.codes_batch(ws_list, wb)
                sc, _, _ = swd.sw_banded_pallas(
                    jnp.asarray(qcodes), jnp.asarray(wcodes), band=band)
                sc = np.asarray(sc)
                n_scored += len(group)
                for (qn, ci), s in zip(group, sc):
                    scores[(qn, ci)] = float(s)
            for qn in cand:
                if len(cand[qn]) <= 1:
                    continue
                ss = [scores.get((qn, ci), 0.0)
                      for ci in range(len(cand[qn]))]
                best = max(ss) if ss else 0.0
                survivors[qn] = [ci for ci, s in enumerate(ss)
                                 if s >= 0.8 * best]

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
