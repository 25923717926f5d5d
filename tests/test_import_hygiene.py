"""Import-time hygiene: ``import audio_tpu`` must not initialize the XLA
backend.

``jax.distributed.initialize`` (multi-host SPMD) must run before ANYTHING
touches the backend; a module-level ``jnp.<scalar>(...)`` constant anywhere
in the package silently breaks every multi-process launch that imports
audio_tpu first (this regressed once via a beam-search fingerprint
constant).  Subprocess-based so the check sees a fresh interpreter.
"""

import subprocess
import sys


def test_import_does_not_initialize_backend():
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');\n"
        "import audio_tpu, audio_tpu.parallel, audio_tpu.models\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'import initialized the XLA backend'\n"
        "print('clean')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0 and "clean" in out.stdout, out.stderr[-2000:]
