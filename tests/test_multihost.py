"""Multi-process runtime smoke test: two local processes form one JAX
cluster via multihost_initialize (the reference's Ray
DistributedTrainableCreator capability, ray_trainer.py:41-45) and run a
cross-process psum."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from carla_imitation_learning_tpu.parallel.mesh import multihost_initialize

    pid = int(sys.argv[1])
    ok = multihost_initialize(coordinator_address="127.0.0.1:%PORT%",
                              num_processes=2, process_id=pid)
    assert ok, "multihost_initialize returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()   # 2 cpu devs / proc

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np

    mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
    # global (4,2) array sharded over all 4 devices across both processes;
    # each process contributes its local (2,2) rows
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.full((2, 2), float(pid + 1)))
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    # process 0 rows are 1.0, process 1 rows are 2.0: 2*2*1 + 2*2*2 = 12
    assert float(total) == 12.0, float(total)
    print(f"proc {pid} ok", flush=True)
""")


def test_two_process_cpu_cluster(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = WORKER.replace("%PORT%", str(port))
    path = tmp_path / "worker.py"
    path.write_text(script)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers configure their own device counts
    # the worker script lives in tmp_path: put the repo root (the package's
    # parent) on the path explicitly
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(path), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out


def test_single_process_is_noop():
    from carla_imitation_learning_tpu.parallel.mesh import multihost_initialize

    # no explicit args, no cluster env → must not touch the backend
    assert multihost_initialize() is False
