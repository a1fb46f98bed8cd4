"""True multi-process distributed-eval test: two jax processes over the
distributed runtime exercise `allgather_results` (the DCN path that
replaces NCCL all_gather_object). The reference has no multi-node test
harness at all (SURVEY §4); this is ours.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.distributed.initialize(sys.argv[1], num_processes=2,
                           process_id=int(sys.argv[2]))
from emu_tpu.mm_eval.engine import allgather_results, dedupe, shard_for_process

rank = jax.process_index()
all_samples = [{"instance_id": i, "prediction": f"p{i}"} for i in range(7)]
mine = shard_for_process(all_samples)
merged = dedupe(allgather_results(mine))
ids = sorted(r["instance_id"] for r in merged)
print("RESULT", json.dumps({"rank": rank, "ids": ids}), flush=True)
assert ids == list(range(7)), ids
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_allgather(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "PYTHONPATH": "/root/repo"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(rank)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for rank in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed runtime unavailable/slow in sandbox")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert '"ids": [0, 1, 2, 3, 4, 5, 6]' in out, out
