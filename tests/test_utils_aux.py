"""Checkpoint/resume (orbax) and profiling helpers."""

import jax
import jax.numpy as jnp
import numpy as np

import optax

from audio_tpu.utils import CheckpointManager, benchmark, compiled_cost
from audio_tpu.parallel import host_chip_mesh


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = {"params": params, "opt_state": opt_state, "step": 7}
    assert mgr.restore() is None
    mgr.save(7, state)
    mgr.save(8, {**state, "step": 8})
    mgr.save(9, {**state, "step": 9})
    assert mgr.latest_step() == 9
    assert mgr.all_steps() == [8, 9]  # max_to_keep=2 pruned step 7
    restored = mgr.restore()
    assert restored["step"] == 9
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.asarray(params["w"]))
    # restore with target structure
    restored8 = mgr.restore(step=8, like=state)
    assert restored8["step"] == 8
    mgr.close()


def test_compiled_cost_and_benchmark():
    def f(x):
        return (x @ x.T).sum()

    x = jnp.ones((64, 64))
    cost = compiled_cost(f, x)
    assert cost["flops"] is None or cost["flops"] > 0
    res = benchmark(jax.jit(f), x, warmup=1, iters=3)
    assert res["mean_seconds"] > 0


def test_host_chip_mesh_shape():
    mesh = host_chip_mesh()
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.size == jax.device_count()
