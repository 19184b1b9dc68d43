"""Checkpoint/resume for long device computations.

The reference checkpoints only at pipeline granularity (every intermediate
file lands on GCS between Cromwell tasks; SURVEY §5).  Here the in-process
walk state is checkpointable too: the batched walk kernels carry all state in
arrays, so a checkpoint is an npz of (cursor kmers, activity, emitted bases so
far) plus the graph identity, and resume re-enters the scan from the saved
frontier.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np


def graph_fingerprint(g) -> str:
    """Stable identity for a graph's record set."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(g.kmers).tobytes())
    h.update(np.ascontiguousarray(g.coverages).tobytes())
    h.update(np.ascontiguousarray(g.edges).tobytes())
    return h.hexdigest()[:16]


def save_walk_state(path, *, cur, active, bases_so_far, graph_fp: str,
                    meta=None) -> None:
    np.savez_compressed(
        path,
        cur=np.asarray(cur), active=np.asarray(active),
        bases=np.asarray(bases_so_far),
        meta=json.dumps({"graph": graph_fp, **(meta or {})}))


def load_walk_state(path) -> dict:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    return {"cur": z["cur"], "active": z["active"], "bases": z["bases"],
            "meta": meta}


def resume_walks(dg, colors, state: dict, num_steps: int):
    """Continue interrupted walks from a saved frontier.  Returns (bases
    [T, B] continuing the saved stream, cycled, steps)."""
    import jax.numpy as jnp
    from ..ops import cuckoo as ck

    buckets = dg.walk_buckets(colors)
    seeds = jnp.asarray(state["cur"])
    return ck.walk_forward_spec(buckets, seeds, dg.kmer_size, num_steps)
