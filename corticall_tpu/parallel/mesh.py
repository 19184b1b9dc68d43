"""Multi-chip graph sharding: hash-sharded k-mer table + all_to_all lookups.

The reference has no in-process distribution (SURVEY §2.4; Cromwell scatters
whole JVMs).  Here the graph itself scales past one chip's HBM:

- records are sharded by a routing hash of the canonical kmer over a 1-D
  device mesh axis ("shards"); each device holds its record slice and a local
  cuckoo table (ops/cuckoo.py) over just that slice;
- walks are data-parallel over the same axis; each lookup step routes queries
  to their owning shard with jax.lax.all_to_all (the MoE token-routing
  pattern), answers locally by vectorized probe, and routes results back;
- frontier statistics reduce with psum over the axis.

Collectives ride ICI within a slice; the sharding is expressed with
jax.sharding.Mesh + shard_map so XLA schedules the exchanges.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import graph as gr
from ..ops import cuckoo as ck
from ..ops import hashtable as ht
from ..ops import kmer_jax as kj

AXIS = "shards"


def routing_hash_np(words: np.ndarray) -> np.ndarray:
    """Shard-routing hash (distinct stream from the table hash: re-mixed)."""
    return ht._np_mix32(ht.np_hash_words(words) ^ np.uint32(0x9E3779B9))


def routing_hash(words: jnp.ndarray) -> jnp.ndarray:
    return kj.mix32(kj.hash_words(words) ^ jnp.uint32(0x9E3779B9))


@dataclass
class ShardedGraph:
    """Per-shard record arrays (stacked on a leading mesh axis) + local
    cuckoo tables (payload = shard-local record index + 1)."""
    kmer_size: int
    num_shards: int
    kmers: jnp.ndarray      # uint32[n, Nmax, W]
    edges: jnp.ndarray      # uint8[n, Nmax, C]
    coverages: jnp.ndarray  # uint32[n, Nmax, C]
    buckets: jnp.ndarray    # uint32[n, NB, 4*(W+1)] per-shard cuckoo tables
    counts: np.ndarray      # int64[n] real record count per shard

    @classmethod
    def from_graph(cls, g: gr.CortexGraph, num_shards: int) -> "ShardedGraph":
        h = routing_hash_np(g.kmers)
        shard = (h % np.uint32(num_shards)).astype(np.int64)
        counts = np.bincount(shard, minlength=num_shards)
        n_max = max(int(counts.max()), 1)
        w = g.kmers.shape[1]
        c = g.num_colors
        kmers = np.zeros((num_shards, n_max, w), dtype=np.uint32)
        edges = np.zeros((num_shards, n_max, c), dtype=np.uint8)
        covs = np.zeros((num_shards, n_max, c), dtype=np.uint32)
        nb = 4
        while nb * ck.BUCKET_SIZE * 0.5 < n_max:
            nb *= 2
        buckets = np.zeros((num_shards, nb, ck.BUCKET_SIZE * (w + 1)),
                           dtype=np.uint32)
        for s in range(num_shards):
            sel = shard == s
            ns = int(counts[s])
            if ns == 0:
                continue
            kmers[s, :ns] = g.kmers[sel]
            edges[s, :ns] = g.edges[sel]
            covs[s, :ns] = g.coverages[sel]
            table = ck.build_cuckoo(
                g.kmers[sel], np.arange(ns, dtype=np.uint32) + 1,
                num_buckets=nb)
            buckets[s] = table.buckets
        return cls(g.kmer_size, num_shards, jnp.asarray(kmers), jnp.asarray(edges),
                   jnp.asarray(covs), jnp.asarray(buckets), counts)


def sharded_lookup_fn(num_shards: int, payload_fn=None):
    """Build the per-shard lookup body for use inside shard_map.

    Returns f(queries_local [Bl, W], kmers_s, edges_s, covs_s, buckets_s) ->
    (idx [Bl] shard-local record index or -1, shard [Bl] owning shard,
     payload [Bl, ...] gathered by payload_fn(edges_s, covs_s, idx)).
    The local answer is a one-gather cuckoo lookup (ops/cuckoo.py).
    """

    def f(queries, kmers_s, edges_s, covs_s, buckets_s):
        bl = queries.shape[0]
        cap = bl  # worst-case bucket capacity (correct always; see module doc)
        t = (routing_hash(queries) % jnp.uint32(num_shards)).astype(jnp.int32)
        order = jnp.argsort(t)
        t_sorted = t[order]
        q_sorted = queries[order]
        starts = jnp.searchsorted(t_sorted, jnp.arange(num_shards, dtype=jnp.int32))
        counts = jnp.searchsorted(t_sorted, jnp.arange(num_shards, dtype=jnp.int32),
                                  side="right") - starts

        # send buffer [n, cap, W]: bucket s = queries routed to shard s.
        # pad before slicing — dynamic_slice clamps starts near the end,
        # which would silently alias bucket 0 when cap == bl.
        q_pad = jnp.concatenate([q_sorted, jnp.zeros_like(q_sorted)], axis=0)

        def bucket(s):
            sl = jax.lax.dynamic_slice(
                q_pad, (starts[s], 0), (cap, q_pad.shape[1]))
            valid = (jnp.arange(cap) < counts[s])[:, None]
            return jnp.where(valid, sl, 0)

        send = jnp.stack([bucket(s) for s in range(num_shards)])
        recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0, tiled=False)

        # answer locally: recv [n, cap, W] -> idx [n, cap]
        flat = recv.reshape(num_shards * cap, -1)
        w = flat.shape[1]
        idx = ck.lookup_payload(buckets_s, flat, w).astype(jnp.int32) - 1
        if payload_fn is not None:
            pay = payload_fn(edges_s, covs_s, idx)
            pay = pay.reshape((num_shards, cap) + pay.shape[1:])
        idx = idx.reshape(num_shards, cap)

        # route answers back to the askers
        idx_back = jax.lax.all_to_all(idx, AXIS, split_axis=0, concat_axis=0)
        rank = jnp.arange(bl, dtype=jnp.int32) - starts[t_sorted]
        ans_sorted = idx_back[t_sorted, rank]
        ans = jnp.zeros(bl, dtype=ans_sorted.dtype).at[order].set(ans_sorted)

        pay_out = None
        if payload_fn is not None:
            pay_back = jax.lax.all_to_all(pay, AXIS, split_axis=0, concat_axis=0)
            ps = pay_back[t_sorted, rank]
            pay_out = jnp.zeros(ps.shape, ps.dtype).at[order].set(ps)
        return ans, t, pay_out

    return f


def make_sharded_walk_step(mesh: Mesh, sg: ShardedGraph, colors, k: int):
    """One data-parallel frontier step over the hash-sharded graph.

    Returns a jitted fn(state) -> state where state = (cur uint32[B, W],
    active bool[B]); B is sharded over the mesh axis.  Each step:
    canonicalize locally, all_to_all-route lookups to owning shards, decode
    the returned edge byte, advance single-successor walks, psum live stats.
    """
    num_shards = sg.num_shards
    colors = list(colors)

    def payload(edges_s, covs_s, idx):
        e = edges_s[jnp.maximum(idx, 0)][:, colors]
        out = e[:, 0]
        for i in range(1, len(colors)):
            out = out | e[:, i]
        return jnp.where(idx >= 0, out, 0).astype(jnp.uint8)

    lookup = sharded_lookup_fn(num_shards, payload)

    def step(cur, active, kmers_s, edges_s, covs_s, buckets_s):
        # shard_map gives leading axis of size 1 per device; drop it
        kmers_s = kmers_s[0]
        edges_s = edges_s[0]
        covs_s = covs_s[0]
        buckets_s = buckets_s[0]
        canon, flipped = kj.canonicalize_words(cur, k)
        idx, _, e = lookup(canon, kmers_s, edges_s, covs_s, buckets_s)
        e = e.astype(jnp.uint32)
        next_mask = jnp.where(flipped, e >> 4, e & 0xF)
        n = kj.popcount4(next_mask)
        base = kj.lowest_set_base(next_mask)
        nxt = kj.shift_append(cur, base.astype(jnp.uint32), k)
        advance = active & (n == 1) & (idx >= 0)
        cur = jnp.where(advance[:, None], nxt, cur)
        live = jax.lax.psum(advance.sum(), AXIS)
        return cur, advance, live

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P()),
    )

    @jax.jit
    def run(cur, active):
        return sharded(cur, active, sg.kmers, sg.edges, sg.coverages, sg.buckets)

    return run
