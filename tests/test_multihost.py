"""Multi-host smoke test: a REAL two-process `jax.distributed.initialize`
rendezvous over a loopback coordinator, through `init_distributed`
(`parallel/mesh.py`) — the TPU translation of the reference worker-pool
bring-up (``videosys/core/mp_utils.py:32-48`` TCP-store port haggling).

Each worker process forces the CPU backend with 2 virtual local devices, so
the rendezvous produces a 2-host x 2-device global view; a psum over the
global mesh proves cross-process collectives execute (DCN-emulated on
loopback gRPC)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from magcache_tpu.parallel.mesh import init_distributed

    coord = sys.argv[1]
    pid = int(sys.argv[2])
    n = init_distributed(coordinator_address=coord, num_processes=2,
                         process_id=pid)
    assert n == 4, f"global devices {{n}} != 4"
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 2

    # cross-process collective: psum of per-process values over the global
    # mesh must see both hosts
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    mesh = Mesh(jax.devices(), ("x",))
    @jax.jit
    def allsum(v):
        return jax.shard_map(
            lambda a: jax.lax.psum(a, "x"), mesh=mesh,
            in_specs=P("x"), out_specs=P())(v)

    local = jnp.full((2,), float(pid + 1), jnp.float32)
    arr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("x"))
    out = allsum(arr)
    # devices 0,1 carry 1.0 (pid 0) and 2,3 carry 2.0 (pid 1) -> sum 6
    val = float(out.addressable_data(0)[0])
    assert abs(val - 6.0) < 1e-6, val
    print(f"worker {{pid}} ok: psum={{val}}")
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous_and_collective(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"worker {pid} ok" in out
