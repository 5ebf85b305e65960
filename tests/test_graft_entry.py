"""Driver interface contract: entry() compiles, dryrun_multichip executes."""

import sys

import jax
import numpy as np
import pytest


sys.path.insert(0, "/root/repo")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 64, 64)
    assert len(np.unique(np.asarray(out))) >= 1


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
