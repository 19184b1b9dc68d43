"""Measure the native-C++ linked walker vs the device jump+filter path
across seed batch sizes.

_NATIVE_LINK_THRESHOLD (commands/core.py) routes linked Partition to the
C++ exact walker below a seed count and to the device jump-table path
(link-free jump walks + exact linked replay of link-touching walks) above
it.  This tool times both strategies on a Pf-scale graph + real threaded
links at several seed counts and prints one JSON line per point so the
crossover is chosen from data; the measured artifact is committed as
LINKBENCH_r04.json and _NATIVE_LINK_THRESHOLD cites it.

Both timings EXCLUDE the one-time jump-table build/compile (reported
separately): in the production pipeline the table build amortizes across
the whole Partition stage and, on rigs with a working compile cache,
across runs.

Usage:
  PF_WORKDIR=/tmp/pf2_work python tools/bench_link_threshold.py
The workdir must contain joined.ctx and kid.ctp.bgz (a completed
reads-mode demo run).  Runs on whatever backend jax selects.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from corticall_tpu import graph as gr, kmer as km, native as nat
    from corticall_tpu.io import ctx as ctxio, links as lkio
    from corticall_tpu.ops import cuckoo as cko
    from corticall_tpu.ops import walk_np as wnp
    from corticall_tpu.caller.call import _kmer_hash_codes
    import jax
    import jax.numpy as jnp

    wd = os.environ.get("PF_WORKDIR", "/tmp/pf2_work")
    sizes = [int(s) for s in os.environ.get(
        "LINKBENCH_SIZES", "1024,4096,16384,65536").split(",")]
    num_steps = int(os.environ.get("LINKBENCH_STEPS", "2000"))

    g = gr.CortexGraph(ctxio.read_ctx(os.path.join(wd, "joined.ctx")))
    links = [lkio.open_links(os.path.join(wd, "kid.ctp.bgz"))]
    child = g.color_for_sample("kid")
    k = g.kmer_size
    rng = np.random.default_rng(3)

    # seeds: child-covered kmers (uniform sample; same walk work per seed
    # class as Partition's ROI seeds)
    cov = g.coverages[:, child] > 0
    idx_all = np.nonzero(cov)[0]
    picks = rng.choice(idx_all, size=max(sizes), replace=False)
    all_seeds = [g.kmer_string(int(i)) for i in picks]
    all_rc = [km.revcomp(s) for s in all_seeds]

    t0 = time.perf_counter()
    native = nat.LinksWalkerNative(g, [child], links)
    native_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    jt = cko.build_jump_table(g.kmers, g.edges[:, child], k)
    jax.block_until_ready(jt.rows)
    jump_build = time.perf_counter() - t0

    key_strs = set()
    for lm in links:
        idx = getattr(lm, "index", None)
        key_strs |= set(idx if idx is not None else getattr(lm, "records", {}))
    link_keys = (np.unique(_kmer_hash_codes(
        km.strings_to_codes(sorted(key_strs)))) if key_strs else None)

    def device_assemble(seeds, rcs):
        f_seeds = jnp.asarray(km.pack_codes(km.strings_to_codes(seeds), k))
        r_seeds = jnp.asarray(km.pack_codes(km.strings_to_codes(rcs), k))
        fpk, _, fst, _ = cko.walk_forward_jumps(
            jt.buckets, jt.rows, f_seeds, k, num_steps)
        rpk, _, rst, _ = cko.walk_forward_jumps(
            jt.buckets, jt.rows, r_seeds, k, num_steps)
        relink, total = [], 0
        for i, s in enumerate(seeds):
            fwd = wnp.replay_jump_walk(s, fpk[i], int(fst[i]), num_steps)
            back = wnp.replay_jump_walk(rcs[i], rpk[i], int(rst[i]), num_steps)
            path = (km.revcomp(back) if back else "") + s + fwd
            total += len(path)
            if link_keys is not None:
                codes = km.string_to_codes_permissive(path)
                wins = km.kmerize_codes(codes, k)
                canon, _ = km.canonicalize_codes(wins)
                h = _kmer_hash_codes(canon)
                pos = np.minimum(np.searchsorted(link_keys, h),
                                 len(link_keys) - 1)
                if bool(np.any(link_keys[pos] == h)):
                    relink.append(i)
        if relink:
            f, _ = native.walk([seeds[i] for i in relink], num_steps)
            bk, _ = native.walk([rcs[i] for i in relink], num_steps)
        return total, len(relink)

    # warm both paths (device compile excluded from timings)
    device_assemble(all_seeds[:256], all_rc[:256])
    native.walk(all_seeds[:64], num_steps)

    rows = []
    for n in sizes:
        seeds, rcs = all_seeds[:n], all_rc[:n]
        t0 = time.perf_counter()
        nb, _ = native.walk(seeds, num_steps)
        nr, _ = native.walk(rcs, num_steps)
        t_nat = time.perf_counter() - t0
        nat_bases = sum(len(s) for s in nb) + sum(len(s) for s in nr)

        t0 = time.perf_counter()
        total, n_relink = device_assemble(seeds, rcs)
        t_dev = time.perf_counter() - t0

        row = {
            "seeds": n,
            "native_s": round(t_nat, 3),
            "device_s": round(t_dev, 3),
            "native_bases_per_s": round(nat_bases / t_nat),
            "device_link_replays": n_relink,
            "speedup_device": round(t_nat / t_dev, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "metric": "linked_walk_device_vs_native",
        "graph_records": g.num_records,
        "num_steps": num_steps,
        "native_build_s": round(native_build, 1),
        "jump_table_build_s": round(jump_build, 1),
        "rows": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
