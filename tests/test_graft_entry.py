"""Driver-contract tests: entry() traces; dryrun_multichip runs DP×TP."""

import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally (finite loss, step count)


def test_dryrun_multichip_2():
    import __graft_entry__ as g

    g.dryrun_multichip(2)


def test_entry_traces():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == () and out.dtype.name == "float32"
