"""Multi-host entry test: 2 CPU processes over jax.distributed.

Exercises the real `trainer.multihost` code path — initialize_distributed,
per-process data sharding (DataLoader num_shards), and the global-batch
assembly in mesh.shard_batch (make_array_from_process_local_data) — with a
jitted psum-carrying train step, on one machine via two subprocesses
(the reference analogue is Lightning DDP over two CPU ranks, ddp_sim).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, {repo!r})
from tunevlseg_tpu.parallel import mesh as mesh_lib

mesh_lib.initialize_distributed({{
    "coordinator_address": {addr!r},
    "num_processes": 2,
    "process_id": {pid},
}})
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2  # one local CPU device per process

from tunevlseg_tpu.data.pipeline import DataLoader

class DS:
    def __len__(self):
        return 8
    def __getitem__(self, i):
        return {{"image": np.full((1, 4, 4), float(i), np.float32),
                "mask": np.zeros((1, 4, 4), np.float32),
                "input_ids": np.full((3,), i, np.int32),
                "attention_mask": np.ones((3,), np.int32)}}

loader = DataLoader(DS(), batch_size=2, shuffle=False, num_workers=1,
                    num_shards=2, shard_index={pid})
assert len(loader) == 2
batches = list(loader)
# shard {pid} sees samples {pid}, {pid}+2, ... (DistributedSampler stride)
got = [float(b["image"][j, 0, 0, 0]) for b in batches for j in range(2)]
assert got == [{pid} + 2 * k for k in range(4)], got

mesh = mesh_lib.make_mesh()
sharded = mesh_lib.shard_batch(mesh, {{k: v for k, v in batches[0].items()
                                      if k != "valid"}})
assert sharded["image"].shape == (4, 1, 4, 4)  # global batch = 2 x local 2

import jax.numpy as jnp
@jax.jit
def global_mean(x):
    return jnp.mean(x)  # GSPMD inserts the cross-process reduction

m = float(global_mean(sharded["image"]))
# global batch holds samples 0,2 (proc 0) and 1,3 (proc 1) -> mean 1.5
assert abs(m - 1.5) < 1e-6, m
print("MULTIHOST_OK", {pid}, m)
"""


@pytest.mark.slow
def test_two_process_cpu_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # exactly one local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _WORKER.format(repo=REPO, addr=addr, pid=pid)],
            env=env, cwd=tmp_path, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-2000:]}"
        assert f"MULTIHOST_OK {pid}" in out
