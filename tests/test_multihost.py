"""Multi-host runtime bring-up (SURVEY §2e item 3): a REAL 2-process
`jax.distributed.initialize` smoke test over localhost — the CPU-grade
stand-in for a TPU pod's per-host bring-up (the environment has one chip,
so pods can't be exercised; what CAN be pinned is that the coordinator
handshake, process ranking, and global device view work through our CLI
wiring (`--multihost` → parallel/mesh.py initialize_multihost)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dgcnn_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(
        coordinator_address=sys.argv[1],
        num_processes=2,
        process_id=int(sys.argv[2]),
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2 * jax.local_device_count()
    # one collective across both processes: global psum of per-process rank
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    total = multihost_utils.process_allgather(
        jnp.asarray(float(jax.process_index()))
    ).sum()
    assert float(total) == 1.0, float(total)  # 0 + 1
    print("MULTIHOST_OK", jax.process_index())
    """
)


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    port = _free_port()
    coord = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
