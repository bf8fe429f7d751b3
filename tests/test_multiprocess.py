"""Multi-process (multi-host simulation) jax.distributed smoke.

Two processes rendezvous through jax.distributed.initialize (the DIST
INITIALIZE path that replaces torch.distributed env:// init,
train_adv.py:84-88), each contributing 2 virtual CPU devices; the test
asserts global device enumeration and a cross-process psum.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    # cross-process collective: psum of per-device ranks over all 4 devices
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
    def f(x):
        return jax.lax.psum(x, "data")
    from jax.experimental.shard_map import shard_map
    g = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P()))
    local = np.arange(4, dtype=np.float32)  # global array [0,1,2,3]
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local[2 * pid: 2 * pid + 2],
        global_shape=(4,))
    out = g(arr)
    total = float(np.asarray(jax.device_get(out))[()] if out.ndim == 0 else
                  np.asarray(jax.device_get(out))[0])
    assert abs(total - 6.0) < 1e-6, total
    print(f"proc{pid} OK total={total}", flush=True)
""")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    procs = [subprocess.Popen([sys.executable, str(worker), str(port), str(i)],
                              cwd=REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i}:\n{out[-3000:]}"
        assert f"proc{i} OK" in out
