"""2-process jax.distributed CPU test: exercises parallel/distributed.initialize
end-to-end (coordinator handshake, global device view, cross-process collective).

The reference has no distributed backend at all (SURVEY.md 5.8); this validates
the TPU-native replacement's multi-host entry point without multi-host hardware.
"""
import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    # each process gets 2 virtual devices -> 4 global
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.environ["REPO_ROOT"])
    # the container's sitecustomize imports jax with JAX_PLATFORMS=axon pinned;
    # override post-import via config (same pattern as tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from raytracer_tpu.parallel import distributed

    pid = int(sys.argv[1])
    idx = distributed.initialize(
        coordinator_address="127.0.0.1:%s", num_processes=2, process_id=pid
    )
    assert idx == pid, (idx, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    # cross-process collective over the global mesh
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = distributed.global_mesh((4,), ("dp",))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")),
        jnp.full((2,), float(pid + 1), jnp.float32),
        (4,),
    )
    f = jax.jit(
        jax.shard_map(
            lambda v: jax.lax.psum(jnp.sum(v), "dp"),
            mesh=mesh, in_specs=P("dp"), out_specs=P(),
        )
    )
    total = f(x)
    # global array = [1,1,2,2] -> psum of local sums = 6, replicated everywhere
    assert float(np.asarray(total.addressable_data(0))) == 6.0
    print("OK", pid)
    """
)


def test_two_process_distributed_psum(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER % port)
    env = dict(os.environ)
    env["REPO_ROOT"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"OK {pid}" in out
