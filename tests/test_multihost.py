"""Cross-process sharded execution: the 2-process jax.distributed dryrun
(tools/dryrun_multihost.py) run end to end in CI.

Covers what the single-process virtual mesh cannot: gloo collectives across
real process boundaries, per-host byte-range .ctx loading
(io.ctx.read_ctx_range), device-side record redistribution to hash owners,
and bit-identical walks / FindROIs / linked walks on the global mesh.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dryrun_bit_identical():
    env = dict(os.environ)
    # the workers set their own platform/flags; the launcher just needs cpu
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-u", os.path.join(REPO, "tools", "dryrun_multihost.py")],
        env=env, capture_output=True, text=True, timeout=800)
    assert out.returncode == 0, out.stderr[-4000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["ok"] and res["processes"] == 2
    assert res["global_devices"] == 8
    assert res["contigs_identical"] > 0
    assert res["linked_identical"] == res["rois"] > 0
