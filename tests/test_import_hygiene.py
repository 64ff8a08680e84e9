"""Importing the package must not initialize the XLA backend.

`jax.distributed.initialize` (parallel/runtime.py) must run before ANY
backend touch; a module-level `jnp.asarray`/device constant anywhere in
the import graph silently breaks every multi-host entry point (this
exact bug shipped in round 1 as `matcher._BIG = jnp.float32(1e30)`).
Run in a subprocess so this test can't be poisoned by other tests'
backend usage.
"""

import subprocess
import sys

_PROBE = """
import jax
import visualodometry_tpu
import visualodometry_tpu.parallel.runtime
import visualodometry_tpu.parallel
import visualodometry_tpu.ba
import visualodometry_tpu.core
import visualodometry_tpu.frontend
import visualodometry_tpu.geometry
import visualodometry_tpu.estimation
import visualodometry_tpu.eval
assert jax._src.xla_bridge._backends == {}, (
    "package import initialized an XLA backend; find the module-level "
    "device constant and make it a host value"
)
print("IMPORT_CLEAN")
"""


def test_package_import_initializes_no_backend():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "IMPORT_CLEAN" in proc.stdout
