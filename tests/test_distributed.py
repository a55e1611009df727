"""Multi-host coordination exercised FOR REAL on one box: two processes
form a jax.distributed cluster (Gloo over loopback — the TPU-native answer
to the reference's loopback-NCCL stand-in, ref:scripts/denoiser/
flux_qwen2p5vl_7b_vlm_stage2_1024.sh NCCL_SOCKET_IFNAME=lo) through
parallel.distributed.initialize() and run a pjit-sharded computation over
the 2-process global mesh."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from gpt_image_edit_tpu.parallel.distributed import initialize
initialize()  # MASTER_ADDR/PORT + WORLD_SIZE/RANK env protocol
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
mesh = Mesh(np.asarray(jax.devices()).reshape(2), ("data",))
rank = jax.process_index()

# each process contributes its own shard of a global batch
local = jnp.full((1, 4), float(rank + 1))
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), local, (2, 4)
)

@jax.jit
def global_sum(x):
    return jnp.sum(x)

total = float(global_sum(garr))  # psum across the 2 processes' shards
assert total == (1.0 + 2.0) * 4, total
print(f"MULTIHOST_OK rank={{rank}} total={{total}}", flush=True)
"""


def test_two_process_cluster(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            MASTER_ADDR="127.0.0.1",
            MASTER_PORT=str(port),
            WORLD_SIZE="2",
            RANK=str(rank),
        )
        env.pop("XLA_FLAGS", None)  # 1 device per process
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "MULTIHOST_OK" in out, out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
