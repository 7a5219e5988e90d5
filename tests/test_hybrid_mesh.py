"""Hybrid (DCN x ICI) mesh + profiling harness smoke tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from simplerecon_tpu.parallel.mesh import make_hybrid_mesh


def test_hybrid_mesh_axes_and_psum():
    mesh = make_hybrid_mesh(ici_axis_size=4, dcn_axis_size=2)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)

    # data-parallel over BOTH axes: global sum must see all 8 shards
    x = np.arange(8, dtype=np.float32)

    @jax.jit
    def total(v):
        return jnp.sum(v)

    sharded = jax.device_put(
        x, NamedSharding(mesh, P(("replica", "data"))))
    assert float(total(sharded)) == 28.0


def test_profiling_stage_timer(tmp_path):
    from simplerecon_tpu.utils.profiling import StageTimer, trace

    timer = StageTimer()
    with timer.stage("decode"):
        _ = sum(range(1000))
    with timer.stage("decode"):
        _ = sum(range(1000))
    summary = timer.summary()
    assert summary["decode"]["count"] == 2
    assert summary["decode"]["total_s"] > 0
    out = timer.dump(str(tmp_path / "stages.json"))
    assert "decode" in out

    # device trace writes profiler artifacts
    trace_dir = str(tmp_path / "trace")
    with trace(trace_dir):
        jnp.sum(jnp.ones(16)).block_until_ready()
    assert os.path.isdir(trace_dir)
    assert any(os.scandir(trace_dir))
