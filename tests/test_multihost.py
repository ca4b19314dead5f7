"""Multi-host smoke test: two real processes through
jax.distributed.initialize on CPU (VERDICT r1 next-round #9).

Exercises init_multihost + host_shard + global_batch_from_host_batches the
way two TPU hosts of one slice would use them — coordinator handshake,
disjoint per-host data shards, a globally-sharded array assembled from
process-local data, and a cross-process collective (the jitted global sum).
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = '''
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
pid, port = int(sys.argv[1]), sys.argv[2]
sys.path.insert(0, %r)
import jax
# the axon TPU plugin's sitecustomize prepends itself to jax_platforms even
# under JAX_PLATFORMS=cpu; force pure-CPU before the backend initialises
jax.config.update('jax_platforms', 'cpu')
from yolo_tpu.parallel import (init_multihost, host_shard,
                               global_batch_from_host_batches, make_mesh)
init_multihost(f'localhost:{port}', num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
import jax.numpy as jnp
mesh = make_mesh()                       # (data=4, model=1) over both hosts
items = list(range(8))
mine = host_shard(items)                 # disjoint per-host partition
assert len(mine) == 4 and set(mine) == set(items[pid::2])
local = np.asarray(mine, np.float32).reshape(-1, 1) * np.ones((1, 3),
                                                              np.float32)
g = global_batch_from_host_batches(mesh, local)
assert g.shape == (8, 3), g.shape
total = jax.jit(jnp.sum)(g)              # cross-process psum via SPMD
assert abs(float(total) - 84.0) < 1e-5, float(total)
print(f'MULTIHOST_OK {pid}', flush=True)
''' % (REPO,)


def test_two_process_distributed_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    procs = [subprocess.Popen(
        [sys.executable, '-c', WORKER, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=str(tmp_path)) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
        assert p.returncode == 0, f'proc {i} failed:\n{outs[-1]}'
    for i in range(2):
        assert f'MULTIHOST_OK {i}' in outs[i], outs[i]
