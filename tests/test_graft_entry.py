"""Driver contract tests: entry() compiles, dryrun_multichip(8) runs on
the virtual CPU mesh (SURVEY.md §4 item 6)."""

import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles_small():
    import __graft_entry__ as g

    fn, (variables, images) = g.entry()
    # compile-check on a reduced batch for test speed
    out = jax.jit(fn)(variables, images[:1])
    deltas, logits = out
    assert deltas.shape[0] == 1 and deltas.shape[-1] == 4
