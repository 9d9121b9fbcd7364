"""Multi-HOST proof (VERDICT r1 #10): a real 2-process `jax.distributed`
bring-up over the DCN coordinator — `init_multihost()` env-var path — plus
one data-parallel gradient step whose cross-process reduction is verified
against full-batch numpy math. This is the test behind docs/SCALING.md's
pod story; single-process no-op behavior is covered in test_multichip.py."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)

from misinfo_tpu.core.config import MeshConfig
from misinfo_tpu.core.mesh import init_multihost, make_mesh

assert init_multihost() is True, "env-var multihost init did not run"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()  # one CPU dev per proc

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh(MeshConfig())          # (data=2, model=1) across processes
pid = jax.process_index()

# deterministic GLOBAL batch; each process owns rows [4*pid, 4*pid+4)
rng = np.random.default_rng(0)
Xg = rng.normal(size=(8, 4)).astype(np.float32)
yg = rng.normal(size=(8,)).astype(np.float32)
sh = NamedSharding(mesh, P("data", None))
x = jax.make_array_from_process_local_data(sh, Xg[4 * pid: 4 * pid + 4])
yv = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), yg[4 * pid: 4 * pid + 4])
w = jnp.asarray(np.linspace(-1, 1, 4), jnp.float32)   # replicated params

@jax.jit
def step(w, x, yv):
    def loss(w):
        return jnp.mean((x @ w - yv) ** 2)
    return jax.value_and_grad(loss)(w)

l, g = step(w, x, yv)
# expected FULL-batch values: equality proves the gradient was psum'd
# across processes (a local-shard-only gradient would differ)
w_np = np.linspace(-1, 1, 4).astype(np.float32)
resid = Xg @ w_np - yg
l_exp = float(np.mean(resid ** 2))
g_exp = 2.0 * Xg.T @ resid / len(yg)
np.testing.assert_allclose(float(l), l_exp, rtol=1e-5)
np.testing.assert_allclose(np.asarray(g), g_exp, rtol=1e-4)
print(f"MULTIHOST_OK pid={pid} loss={float(l):.6f}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_init_and_dp_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # no 8-virtual-device override here
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]

    # both processes computed the SAME replicated loss
    losses = {ln.split("loss=")[1] for out in outs
              for ln in out.splitlines() if "MULTIHOST_OK" in ln}
    assert len(losses) == 1, losses
