"""Multi-process (multi-host analog) smoke: two OS processes join a
jax.distributed cluster over CPU, jit ONE global data-parallel train
step (batch sharded one-image-per-process), and rank 0 writes the run
artifacts — the CI-able stand-in for the reference's DDP launch
(reference train.py:578-612: WORLD_SIZE/RANK env + init_process_group +
per-rank batch split + rank-0 eval/ckpt)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multihost_train(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            WORLD_SIZE="2",
            RANK=str(rank),
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
        )
        # one local CPU device per process (2 global): drop the pytest
        # conftest's 8-virtual-device flag the children would inherit
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "rep_yolo_tpu.cli.train",
             "--multihost", "--data", "synthetic:4",
             "--cfg", "cfg/rep_yolo_tiny_test.yaml",
             "--epochs", "1", "--batch-size", "2", "--img-size", "64",
             "--max-labels", "8", "--no-augment", "--no-autoanchor",
             "--no-ota", "--eval-every", "1",
             "--project", str(tmp_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost processes hung >900s:\n"
                    + "\n---\n".join(o or "" for o in outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
    # rank 0 wrote the artifacts; rank 1 wrote none of them
    exp = tmp_path / "exp"
    assert (exp / "results.txt").exists()
    assert (exp / "last.npz").exists()   # multiprocess saves local npz
    proc1 = tmp_path / "exp_proc1"
    assert not (proc1 / "results.txt").exists()
    assert not list(proc1.glob("last.*"))
    # both processes ran the SAME global sharded step: loss lines match
    l0 = [l for l in outs[0].splitlines() if l.startswith("epoch 0/0")]
    l1 = [l for l in outs[1].splitlines() if l.startswith("epoch 0/0")]
    assert l0 and l1
    assert l0[0].split("(")[0] == l1[0].split("(")[0], (l0, l1)
