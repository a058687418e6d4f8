"""Multi-host (DCN) helpers: two-process CPU-simulated cluster test.

Spawns two real OS processes that join one jax.distributed runtime (4
virtual CPU devices each -> 8 global), build the hybrid (data, space) mesh
with the data axis crossing the process (DCN) boundary, and run a global
psum through shard_map. The reference has no multi-process story at all
(SURVEY §5 comm backend row); this is the framework's DCN scaffolding.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    from image_segmenter_tpu.parallel import distributed as D

    pid = int(sys.argv[1]); port = sys.argv[2]
    D.initialize(coordinator_address=f"localhost:{port}",
                 num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert D.is_multi_host()

    mesh = D.hybrid_mesh(ici_shape=(1, 4), dcn_shape=(2, 1))
    # leading (data) axis must be the cross-process one
    procs = np.asarray([[d.process_index for d in row] for row in mesh.devices])
    assert (procs[0] == procs[0, 0]).all() and (procs[1] == procs[1, 0]).all()
    assert procs[0, 0] != procs[1, 0]

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    @jax.jit
    def global_sum(x):
        f = shard_map(lambda a: jax.lax.psum(jnp.sum(a), ("data", "space")),
                      mesh=mesh, in_specs=P("data", "space"), out_specs=P())
        return f(x)

    x = jax.make_array_from_callback(
        (2, 8), NamedSharding(mesh, P("data", "space")),
        lambda idx: np.ones((2, 8), np.float32)[idx])
    total = float(global_sum(x))
    assert total == 16.0, total
    print(f"proc{pid} OK total={total}", flush=True)
""")


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              env=env, cwd=root, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
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
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} OK total=16.0" in out
