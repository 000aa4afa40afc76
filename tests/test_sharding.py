"""Multi-chip paths: sharded megakernel parity and real multi-process jax.distributed.

Round-2 verdict: `plan_batch_mega_sharded` had zero callers and
`init_distributed` was never exercised.  These tests make both live in CI:

  - the megakernel planner sharded over the 8-device virtual mesh must equal
    the unsharded run bit-for-bit (problem-batch data parallelism cannot
    change planner behavior);
  - a genuine 2-process jax.distributed cluster (CPU collectives over
    localhost) initializes through parallel.mesh.init_distributed, builds a
    global mesh, and runs a cross-process psum.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vamp_mvt_tpu.collision import environment as envmod
from vamp_mvt_tpu.parallel import mesh as meshmod
from vamp_mvt_tpu.planning import rrtc, rrtc_mega
from vamp_mvt_tpu.robots import registry


def _wall_problem(B):
    """Wall with a CENTER hole: solvable in a few hundred samples, so the
    interpret-mode megakernel stays fast."""
    spec = registry.sphere_spec(lows=(-3, -3, 0), highs=(3, 3, 3), radius=0.1)
    b = envmod.EnvironmentBuilder()
    for y in np.linspace(-3, 3, 13):
        for z in np.linspace(0, 3, 7):
            if abs(y) < 1.0 and abs(z - 1.0) < 1.0:
                continue
            b.add_sphere([0.0, y, z], 0.3)
    env = b.build()
    envs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape), env
    )
    starts = jnp.broadcast_to(jnp.asarray([-2.0, 0.0, 1.0]), (B, 3))
    goals = (
        jnp.broadcast_to(jnp.asarray([[2.0, 0.0, 1.0]]), (B, 1, 3))
        + jnp.arange(B, dtype=jnp.float32)[:, None, None] * 0.05
    )
    masks = jnp.ones((B, 1), bool)
    return spec, envs, starts, goals, masks


def test_plan_batch_mega_sharded_matches_unsharded():
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest must provide the 8-device virtual mesh"
    mesh = meshmod.make_mesh(8)
    B = 8
    spec, envs, starts, goals, masks = _wall_problem(B)
    settings = rrtc.RRTCSettings(
        range=1.0, max_iterations=384, max_samples=512, max_path=64,
        samples_per_step=4, connect_segments=2, sample_window=2,
    )
    sh = meshmod.plan_batch_mega_sharded(
        spec, mesh, envs, starts, goals, masks, settings
    )
    lo = rrtc_mega.plan_batch_mega(spec, envs, starts, goals, masks, settings)
    assert np.asarray(lo.solved).any()
    assert np.array_equal(np.asarray(sh.solved), np.asarray(lo.solved))
    assert np.array_equal(np.asarray(sh.iterations), np.asarray(lo.iterations))
    assert np.array_equal(
        np.asarray(sh.path_length), np.asarray(lo.path_length)
    )
    np.testing.assert_allclose(np.asarray(sh.cost), np.asarray(lo.cost), rtol=1e-6)


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    from vamp_mvt_tpu.parallel import mesh as meshmod

    pid = int(sys.argv[1])
    n = meshmod.init_distributed(
        coordinator_address={addr!r}, num_processes=2, process_id=pid,
    )
    assert n == 4, f"expected 4 global devices, got {{n}}"
    assert jax.process_count() == 2

    mesh = meshmod.make_mesh()
    sharding = NamedSharding(mesh, PartitionSpec("dp"))
    # per-process local shard of a global (4,) array: value = global index
    local = np.arange(2, dtype=np.float32) + 2 * pid
    arr = jax.make_array_from_process_local_data(sharding, local, (4,))
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, PartitionSpec())
    )(arr)
    expect = float(np.arange(4).sum())
    got = float(np.asarray(jax.device_get(total)))
    assert got == expect, f"psum across processes: {{got}} != {{expect}}"
    print(f"proc {{pid}} OK global_sum={{got}}", flush=True)
    """
)


def test_two_process_jax_distributed(tmp_path):
    """init_distributed + a cross-process reduction, exactly the DCN-crossing
    data-parallel shape SURVEY §5 mandates (faked with 2 CPU processes)."""
    repo = str(Path(__file__).resolve().parent.parent)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, addr=addr))
    # strip the axon-TPU bootstrap (sitecustomize initializes the backend at
    # interpreter start, which jax.distributed.initialize must precede) and
    # any JAX/XLA config leaking from the test process
    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("JAX_", "XLA_", "PALLAS_AXON_", "AXON_"))
        and k != "PYTHONPATH"
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
