"""Driver-contract tests for ``__graft_entry__``.

Round-1 failure mode: the driver invokes ``dryrun_multichip(8)`` bare on a
1-device host (no XLA_FLAGS / JAX_PLATFORMS prep) and the entry died at mesh
construction. These tests pin the contract:

* the module imports WITHOUT touching jax (so a fresh process can still
  provision a virtual mesh);
* ``python __graft_entry__.py multichip 8`` exits 0 from a CLEAN shell —
  the verbatim driver invocation, env scrubbed of the conftest's mesh vars;
* in-process ``dryrun_multichip(8)`` works when devices already exist
  (pytest runs under the 8-device CPU mesh).
"""

import os
import subprocess
import pytest
import sys

import conftest

REPO = conftest.REPO_ROOT
ENTRY = os.path.join(REPO, "__graft_entry__.py")


def _clean_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "DIM_TPU_MULTICHIP_CHILD")}
    # Keep tiny CPU runs off the (slow-compiling) TPU tunnel in CI.
    env.setdefault("JAX_PLATFORMS", "cpu")
    return env


def test_module_import_is_jax_free():
    # This image preloads jax.version/jaxlib at interpreter startup, so the
    # meaningful contract is: importing the entry module adds NO jax modules
    # beyond the preload (in particular does not initialize a backend).
    code = (
        "import sys; before = {m for m in sys.modules if m.startswith('jax')};"
        "sys.path.insert(0, %r); import __graft_entry__;"
        "added = {m for m in sys.modules if m.startswith('jax')} - before;"
        "assert not added, f'import touched jax: {sorted(added)[:5]}'" % REPO)
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO,
                   env=_clean_env(), timeout=120)


def test_driver_multichip_invocation_from_clean_shell():
    """Verbatim driver call: no mesh env vars, 1 visible device, must exit 0.

    Also asserts the TP layout is GSPMD-clean: no involuntary
    rematerialization / replication warnings (the round-2 layout bounced
    activations mid-layer; see parallel/mesh.py TP rules).
    """
    proc = subprocess.run(
        [sys.executable, ENTRY, "multichip", "8"],
        cwd=REPO, env=_clean_env(), timeout=1200,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "dryrun_multichip OK on 8 devices" in proc.stdout
    for bad in ("Involuntary full rematerialization", "will replicate"):
        assert bad not in proc.stdout, (
            "GSPMD resharding warning in multichip dryrun:\n"
            + "\n".join(l for l in proc.stdout.splitlines() if bad in l)[:2000])


@pytest.mark.slow
def test_dryrun_multichip_inproc_on_existing_mesh():
    import jax

    assert len(jax.devices()) >= 8  # conftest provisions the CPU mesh
    sys.path.insert(0, REPO)
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)  # should take the in-process path


def test_entry_compiles_single_device():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__

    fn, ex = __graft_entry__.entry()
    loss = float(jax.jit(fn)(*ex))
    assert loss == loss and abs(loss) < 1e6
