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


def test_module_utils():
    import pytest
    import warnings

    from audio_tpu._internal import module_utils as mu

    assert mu.is_module_available("jax")
    assert not mu.is_module_available("jax", "definitely_not_a_module_xyz")

    import os

    os.environ["_AUDIO_TPU_TEST_FLAG"] = "1"
    assert mu.eval_env("_AUDIO_TPU_TEST_FLAG", False)
    os.environ["_AUDIO_TPU_TEST_FLAG"] = "false"
    assert not mu.eval_env("_AUDIO_TPU_TEST_FLAG", True)
    os.environ["_AUDIO_TPU_TEST_FLAG"] = "banana"
    with pytest.raises(RuntimeError):
        mu.eval_env("_AUDIO_TPU_TEST_FLAG", True)
    del os.environ["_AUDIO_TPU_TEST_FLAG"]
    assert mu.eval_env("_AUDIO_TPU_TEST_FLAG", True)

    @mu.requires_module("definitely_not_a_module_xyz")
    def needs_missing():
        return 1

    with pytest.raises(RuntimeError, match="requires module"):
        needs_missing()

    @mu.requires_module("jax")
    def needs_jax():
        return 2

    assert needs_jax() == 2

    @mu.deprecated("Use new_fn instead.", version="9.9", remove=True)
    def old_fn():
        return 3

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert old_fn() == 3
    assert any("deprecated" in str(x.message) for x in w)

    @mu.fail_with_message("is not available on this build")
    def gated():
        pass

    with pytest.raises(RuntimeError, match="not available"):
        gated()
    assert mu.no_op(needs_jax) is needs_jax
