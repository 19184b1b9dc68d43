"""Measure device vs native-C++ link-assisted walks across seed batch sizes.

_NATIVE_LINK_THRESHOLD (commands/core.py) routes linked Partition to the C++
exact walker below a seed count and to the device kernel above it; the
round-2 threshold (65536) was a guess.  This tool times both walkers on a
Pf-scale graph + real threaded links at 4k/16k/64k/256k seeds and prints one
JSON line per point so the crossover is chosen from data; the measured
artifact is committed as LINKBENCH_r04.json and _NATIVE_LINK_THRESHOLD
cites it.

Usage:
  PF_WORKDIR=/tmp/pf_demo_work python tools/bench_link_threshold.py
The workdir must contain joined.ctx and kid.ctp.bgz (a completed reads-mode
demo run).  Runs on whatever backend jax selects (the TPU in production).
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
    from corticall_tpu.ops.walk_links import LinkedWalker

    wd = os.environ.get("PF_WORKDIR", "/tmp/pf_flagship_r03_run2")
    sizes = [int(s) for s in os.environ.get(
        "LINKBENCH_SIZES", "4096,16384,65536,262144").split(",")]
    num_steps = int(os.environ.get("LINKBENCH_STEPS", "2000"))

    g = gr.CortexGraph(ctxio.read_ctx(os.path.join(wd, "joined.ctx")))
    links = [lkio.open_links(os.path.join(wd, "kid.ctp.bgz"))]
    child = g.color_for_sample("kid")
    rng = np.random.default_rng(3)

    # seeds: child-covered kmers (uniform sample; same walk work per seed
    # class as Partition's ROI seeds)
    cov = g.coverages[:, child] > 0
    idx_all = np.nonzero(cov)[0]
    picks = rng.choice(idx_all, size=max(sizes), replace=False)
    all_seeds = [g.kmer_string(int(i)) for i in picks]

    t0 = time.perf_counter()
    native = nat.LinksWalkerNative(g, [child], links)
    native_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    device = LinkedWalker(g, [child], links)
    device_build = time.perf_counter() - t0

    rows = []
    for n in sizes:
        seeds = all_seeds[:n]
        # native C++ (single thread, exact unbounded LinkStore); both
        # directions like the production assemble (commands/core.py)
        rc = [km.revcomp(s) for s in seeds]
        native.walk(seeds[:64], num_steps)  # warm
        t0 = time.perf_counter()
        nb, _ = native.walk(seeds, num_steps)
        nr, _ = native.walk(rc, num_steps)
        t_nat = time.perf_counter() - t0
        nat_bases = sum(len(s) for s in nb) + sum(len(s) for s in nr)

        # device kernel (fixed-capacity LinkStore, overflow replay flags)
        device.assemble(seeds[:64], num_steps=num_steps)  # warm/compile
        t0 = time.perf_counter()
        contigs, overflow, junctions = device.assemble(seeds, num_steps=num_steps)
        t_dev = time.perf_counter() - t0

        row = {
            "seeds": n,
            "native_s": round(t_nat, 3),
            "device_s": round(t_dev, 3),
            "native_bases_per_s": round(nat_bases / t_nat),
            "device_overflow": int(np.asarray(overflow).sum()),
            "speedup_device": round(t_nat / t_dev, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "metric": "linked_walk_device_vs_native",
        "graph_records": g.num_records,
        "num_steps": num_steps,
        "native_build_s": round(native_build, 1),
        "device_build_s": round(device_build, 1),
        "rows": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
