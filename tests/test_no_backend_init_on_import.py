"""Importing the package must NOT initialize a jax backend.

CLIs force the platform via ``jax.config.update("jax_platforms", ...)``
AFTER parsing args (cli/common.setup); any module-level device array (e.g.
a ``jnp.asarray`` constant) initializes the backend first, which on the axon
plugin opens the TPU tunnel even for CPU-only runs - observed as
minutes-long remote compiles and occasional multi-minute hangs in what were
meant to be CPU smoke runs. Runs in a fresh subprocess because the pytest
process has long since initialized its own backend.
"""

import pkgutil
import subprocess
import sys

import conftest

import dyadic_interaction_modeling_tpu as pkg


def test_package_imports_leave_backend_uninitialized():
    mods = ["dyadic_interaction_modeling_tpu"]
    for m in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + "."):
        mods.append(m.name)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import importlib\n"
        "from jax._src import xla_bridge\n"
        "failed = []\n"
        "for m in %r:\n"
        "    importlib.import_module(m)\n"
        "    if getattr(xla_bridge, '_backends', None):\n"
        "        failed.append(m)\n"
        "        break\n"
        "assert not failed, f'importing {failed[0]} initialized a jax backend'\n"
        % (conftest.REPO_ROOT, mods))
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
