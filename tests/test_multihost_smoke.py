"""2-process × 4-CPU-device ``jax.distributed`` smoke test.

Executes ``parallel.initialize_multihost`` for real (VERDICT r2 missing #3:
it was never run by any test): two OS processes each exposing 4 virtual CPU
devices join one coordinator, build the GLOBAL 8-device mesh, and run a
compiled cross-process collective (global mean of a process-sharded array)
— the same primitive the DP gradient all-reduce uses.  This is the CPU
analog of the reference's per-GPU process spawn
(`/root/reference/utils/commons/trainer.py:116-137`).
"""

import os
import pathlib
import socket
import subprocess
import sys

ROOT = str(pathlib.Path(__file__).resolve().parent.parent)

WORKER = """
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from conan_tpu.parallel import initialize_multihost, make_mesh

pid = int(sys.argv[1]); port = sys.argv[2]
initialize_multihost(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4
mesh = make_mesh(8)
sh = NamedSharding(mesh, P("data"))
local = np.full((4, 8), float(pid + 1), np.float32)  # proc0 ones, proc1 twos
garr = jax.make_array_from_process_local_data(sh, local, (8, 8))
f = jax.jit(jnp.mean, out_shardings=NamedSharding(mesh, P()))
val = float(f(garr))  # cross-process all-reduce
assert abs(val - 1.5) < 1e-6, val
print(f"proc{{pid}} ok mean={{val}}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_four_device_distributed():
    port = _free_port()
    env = dict(os.environ)
    # run the workers WITHOUT the axon TPU plugin (same isolation as
    # conftest's re-exec) and without the parent's 8-device XLA flag
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    script = WORKER.format(root=ROOT)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} ok mean=1.5" in out, out[-3000:]
