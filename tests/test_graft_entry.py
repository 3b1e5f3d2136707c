"""Driver-contract tests: entry() traces; dryrun_multichip runs DP×TP."""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_env():
    """Reproduce the driver's exact invocation: a FRESH process with the
    environment's pinned ``JAX_PLATFORMS=axon`` and no XLA_FLAGS.

    Round-1 regression (MULTICHIP_r01.json): dryrun_multichip saw the single
    tunneled TPU chip instead of forcing a virtual CPU mesh.  The entry point
    must now be self-sufficient.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # the driver's pin
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout


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
