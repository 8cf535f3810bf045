"""Two-process `jax.distributed` CPU validation (round-1 VERDICT item 7).

Spawns two hermetic child interpreters that form a real distributed JAX
cluster (coordinator + worker), build a 4-device global mesh (2 local CPU
devices each), and run one batch-sharded SPMD train step whose gradient
all-reduce crosses the process boundary. This proves
``parallel/mesh.py:maybe_init_distributed`` end-to-end — the same code path
a multi-host TPU pod launch takes.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if "axon" not in v or k not in ("PYTHONPATH",)}
        path_entries = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                        if p and "axon" not in p]
        env["PYTHONPATH"] = os.pathsep.join([REPO] + path_entries)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "multihost_dryrun.py")],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"multihost_dryrun process {pid}/2: ok" in out
        assert "4 global devices on cpu" in out
