"""Multi-host (multi-process) initialization path, actually executed.

Spawns 2 local processes that call `jax.distributed.initialize`
(the exact call site main.py:83-87 runs under
`--coordinator_address/--num_processes/--process_id`), each owning 4
virtual CPU devices, builds the GLOBAL 8-device DP4xTP2 mesh, and runs
one sharded train step whose gradient all-reduce crosses the process
boundary (gloo).  The loss and updated-parameter L1 must equal the
single-process 8-device run of the identical step bit-for-bit-ish
(f32 tolerance) — the collective topology must not change numerics.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_dryrun.py")

requires_8 = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 devices")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@requires_8
def test_two_process_init_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh.json")
    # workers must NOT inherit the test session's pinned platform or
    # its 8-device XLA flag (they force their own 4-device count)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"

    procs = [subprocess.Popen(
        [sys.executable, WORKER, "--process_id", str(i),
         "--num_processes", "2", "--port", str(port), "--out", out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    assert os.path.isfile(out), logs[0][-3000:]
    with open(out) as f:
        multi = json.load(f)
    assert multi["global_devices"] == 8

    # the identical step, single-process on the session's 8-device mesh
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import multihost_dryrun

    from grounded_video_description_tpu.parallel import make_mesh

    single = multihost_dryrun.run_local(
        make_mesh((4, 2), ("data", "model")))

    assert np.isfinite(multi["loss"])
    np.testing.assert_allclose(multi["loss"], single["loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(multi["lm_loss"], single["lm_loss"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(multi["param_l1"], single["param_l1"],
                               rtol=1e-5)
