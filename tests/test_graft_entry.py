"""Driver contract tests: entry() compiles, dryrun_multichip(8) runs on
the virtual CPU mesh (SURVEY.md §4 item 6)."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_self_bootstraps_without_env():
    """The driver calls dryrun_multichip with NO env vars set; it must
    respawn itself onto a CPU mesh (VERDICT.md round-1 item 1)."""
    import os
    import subprocess
    import sys

    import __graft_entry__ as g

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS",
                        g._CHILD_ENV_MARK)}
    repo_root = os.path.dirname(os.path.abspath(g.__file__))
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo_root, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in out.stdout


@pytest.mark.slow
def test_entry_compiles_small():
    import __graft_entry__ as g

    fn, (variables, images) = g.entry()
    # compile-check on a reduced batch for test speed
    out = jax.jit(fn)(variables, images[:1])
    deltas, logits = out
    assert deltas.shape[0] == 1 and deltas.shape[-1] == 4
