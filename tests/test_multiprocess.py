"""TRUE multi-process execution (VERDICT.md round-2 item 5): two OS
processes, 4 virtual CPU devices each, joined by ``jax.distributed`` into an
8-device data mesh (gloo collectives). Each worker materialises only its own
rows of every global batch, trains via BOTH dispatch paths
(device_iter/process_batch and the scanned device_iter_chunks/
process_batch_stacked), and builds a per-host sharded image cache. The test
asserts the two processes agree bitwise with each other and match a
single-process 8-virtual-device run of the same schedule."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_local):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    kept = [f for f in env.get("XLA_FLAGS", "").split() if f and not
            f.startswith("--xla_force_host_platform_device_count")]
    for tf in ("--xla_cpu_collective_call_terminate_timeout_seconds=600",
               "--xla_cpu_collective_timeout_seconds=600"):
        if not any(k.startswith(tf.split("=")[0]) for k in kept):
            kept.append(tf)
    env["XLA_FLAGS"] = " ".join(
        kept + [f"--xla_force_host_platform_device_count={n_local}"])
    env["PYTHONPATH"] = REPO + os.pathsep + HERE + os.pathsep + \
        env.get("PYTHONPATH", "")
    return env


def test_two_process_training_and_cache(tmp_path):
    port = _free_port()
    outdir = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "mp_worker.py"),
             str(pid), "2", str(port), outdir],
            env=_env(4), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    res = []
    for pid in range(2):
        with open(os.path.join(outdir, f"out_{pid}.json")) as f:
            res.append(json.load(f))

    # both processes saw the 8-device mesh and agree bitwise on the run
    assert res[0]["devices"] == res[1]["devices"] == 8
    assert res[0]["losses"] == res[1]["losses"]
    assert res[0]["chunk_losses"] == res[1]["chunk_losses"]
    assert res[0]["checksum"] == res[1]["checksum"]
    assert len(res[0]["losses"]) == 4 and len(res[0]["chunk_losses"]) == 4
    assert all(np.isfinite(res[0]["losses"]))

    # each host eagerly decoded only its 1/2 slice; lazy fill completed both
    assert res[0]["cache_eager"] == res[1]["cache_eager"] == 4
    assert res[0]["cache_sum"] == res[1]["cache_sum"] > 0

    # single-process reference: same schedule on one 8-device process
    env = _env(8)
    code = (
        "import sys; sys.argv=['mp_worker.py','0','1','%d',%r]; "
        "import mp_worker; mp_worker.main()" % (_free_port(), outdir + "/solo")
    )
    os.makedirs(outdir + "/solo", exist_ok=True)
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    with open(os.path.join(outdir, "solo", "out_0.json")) as f:
        solo = json.load(f)
    np.testing.assert_allclose(solo["losses"], res[0]["losses"], rtol=1e-5)
    np.testing.assert_allclose(solo["chunk_losses"], res[0]["chunk_losses"],
                               rtol=1e-5)

    # pipeline parallelism across processes (PipeMeshPlan hooks): both
    # processes agree, and the two-process PP loss/grad-norm matches the
    # single-process run of the same (data=4, pipe=2) program
    assert res[0]["pp_loss"] == res[1]["pp_loss"]
    assert res[0]["pp_gnorm"] == res[1]["pp_gnorm"]
    np.testing.assert_allclose(solo["pp_loss"], res[0]["pp_loss"], rtol=1e-5)
    np.testing.assert_allclose(solo["pp_gnorm"], res[0]["pp_gnorm"],
                               rtol=1e-4)
