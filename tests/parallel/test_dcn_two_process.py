"""Two-process DCN simulation: jax.distributed across 2 processes x 4 CPU
devices, sharded Emformer-RNNT step over a host×chip mesh, grads ==
single-process grads.

This exercises the code path no single-process test can: coordinator
bring-up (``audio_tpu.parallel.init_distributed``), a mesh whose outer axis
spans PROCESS boundaries, and cross-process collectives over a real
inter-process transport (Gloo — the CPU stand-in for DCN between TPU
hosts).  Targets the >=85% two-host scaling clause of BASELINE.json: before
measuring scaling on real pods, the host-boundary math must be right.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from . import _dcn_common as C

_HERE = Path(__file__).parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_grads_match_single_process(tmp_path):
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=os.pathsep.join(
            [str(_HERE.parent.parent)] + os.environ.get("PYTHONPATH", "").split(os.pathsep)
        ),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(_HERE / "dcn_worker.py"), str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        ok = tmp_path / f"ok_{i}"
        assert ok.exists(), f"worker {i} wrote no ok file:\n{out[-4000:]}"
        loss_line, nproc_line, ndev_line = ok.read_text().splitlines()
        assert int(nproc_line) == 2 and int(ndev_line) == 8

    # both processes must agree on the loss
    l0 = float((tmp_path / "ok_0").read_text().splitlines()[0])
    l1 = float((tmp_path / "ok_1").read_text().splitlines()[0])
    assert l0 == l1

    # single-process reference (this pytest process: plain jit, no mesh)
    import jax.numpy as jnp

    model = C.tiny_rnnt()
    params = C.init_params(model)
    src, src_len, tgt, tgt_len, tgt_in = C.make_batch()
    loss_fn = C.make_loss_fn(model)
    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        params, jnp.asarray(src), jnp.asarray(src_len), jnp.asarray(tgt),
        jnp.asarray(tgt_len), jnp.asarray(tgt_in),
    )
    ref = C.grads_to_flat_dict(ref_grads)

    got = np.load(tmp_path / "dcn_grads.npz")
    np.testing.assert_allclose(float(got["loss"]), float(ref_loss), atol=2e-5, rtol=2e-5)
    names = [k for k in got.files if k != "loss"]
    assert set(names) == set(ref.keys())
    for name in names:
        np.testing.assert_allclose(
            got[name], ref[name], atol=2e-5, rtol=2e-5, err_msg=name
        )
