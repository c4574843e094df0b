"""Importing the package must not initialize a JAX backend: the CLI's
--platform switch (and any embedder's platform choice) runs after
import, and the axon TPU plugin hangs hard when its tunnel is down —
an import-time device op would take every CPU-only entry point down
with it (this bit: ops/hungarian's module-level ``jnp.float32``)."""

import subprocess
import sys

CODE = """
# Public, version-proof probe: select a platform that cannot exist
# BEFORE the imports — any import-time backend initialization then
# raises (unknown platform) and fails this subprocess loudly, on every
# jax release and even on CPU-only environments.
import jax
jax.config.update("jax_platforms", "no_such_platform_hygiene_probe")
import mass_tpu
import mass_tpu.agent
import mass_tpu.agent.cli
import mass_tpu.parallel.evaluator
import mass_tpu.parallel.fleet
import mass_tpu.match
import mass_tpu.nav.controller
import mass_tpu.perception.resnet
import mass_tpu.tools.analyze
try:
    from jax._src import xla_bridge
    backends = getattr(xla_bridge, "_backends", None)
except ImportError:
    backends = None
if backends is not None:
    # secondary (private, best-effort) check while it exists
    assert not backends, (
        "import initialized backends: %r" % (dict(backends),))
print("clean")
"""


def test_package_import_initializes_no_backend():
    out = subprocess.run([sys.executable, "-c", CODE],
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "clean" in out.stdout
