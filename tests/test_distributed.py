"""Multi-process (multi-host) execution-layer test.

Launches TWO OS processes, each with 2 virtual CPU devices, joined through
``jax.distributed`` with gloo CPU collectives — the "multi-node without a
cluster" strategy (SURVEY.md section 4). Each process owns one keyframe of
a kf=2 mesh and checks its local block of the sharded step's output against
an independent single-device run (see distributed_worker.py).

The reference has nothing distributed at all (check_cuda_device.cu selects
one GPU); this pins the north-star scale-out layer (BASELINE.json config 5).
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTwoProcessDistributed:
    def test_sharded_step_matches_single_device_across_processes(self):
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        root = os.path.dirname(HERE)
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.join(HERE, "distributed_worker.py"),
                 str(i), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=os.path.dirname(HERE), env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
            assert "distributed lifecycle == single-device" in out, out[-2000:]
            assert "checkpoint-restore continues bitwise" in out, out[-2000:]
        # both processes must have derived the SAME switch decision
        slots = {o.split("switched slot ")[1].split(")")[0] for o in outs}
        assert len(slots) == 1, outs
