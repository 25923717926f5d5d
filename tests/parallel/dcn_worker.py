"""Worker for the two-process DCN simulation test.

Run (by tests/parallel/test_dcn_two_process.py) as::

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python dcn_worker.py <pid> <nproc> <port> <outdir>

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
(through ``audio_tpu.parallel.init_distributed``) joins them into one
8-device topology whose cross-process collectives ride a real inter-process
transport (Gloo) — the CPU stand-in for DCN between TPU hosts.  The sharded
Emformer-RNNT step runs dp over the full ("host", "chip") mesh with
replicated params; process 0 writes the resulting loss + gradients for the
parent test to compare against single-process grads.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

    from audio_tpu.parallel import init_distributed

    init_distributed(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc * jax.local_device_count()

    import jax.numpy as jnp  # noqa: F401
    from jax.sharding import NamedSharding, PartitionSpec as P

    import _dcn_common as C
    from audio_tpu.parallel import host_chip_mesh

    mesh = host_chip_mesh()  # ("host", "chip") = (nproc, local_devices)
    assert mesh.devices.shape == (nproc, jax.local_device_count())
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(("host", "chip")))  # batch over hosts THEN chips

    def gput(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    model = C.tiny_rnnt()
    params = jax.tree.map(lambda x: gput(x, repl), C.init_params(model))
    src, src_len, tgt, tgt_len, tgt_in = C.make_batch()
    args = (
        gput(src, dp), gput(src_len, dp), gput(tgt, dp),
        gput(tgt_len, dp), gput(tgt_in, dp),
    )

    loss_fn = C.make_loss_fn(model)
    step = jax.jit(jax.value_and_grad(loss_fn), out_shardings=(repl, repl))
    loss, grads = step(params, *args)
    assert loss.is_fully_replicated
    loss = float(loss)

    if pid == 0:
        flat = C.grads_to_flat_dict(grads)
        np.savez(os.path.join(outdir, "dcn_grads.npz"), loss=loss, **flat)
    # every process reports success so the parent can detect partial failures
    with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
        f.write(f"{loss}\n{jax.process_count()}\n{jax.device_count()}\n")


if __name__ == "__main__":
    main()
