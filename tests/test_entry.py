"""Driver contract smoke tests: __graft_entry__.entry() compiles single-
device; dryrun_multichip(8) runs on the virtual CPU mesh."""

import sys

import pytest

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    arr = np.asarray(out.raw_sum)
    assert arr.shape == (64, 64, 3)
    assert np.isfinite(arr).all()
    assert int(out.sample_count) == 1


@pytest.mark.slow
def test_dryrun_multichip():
    # slow tier: the driver runs dryrun_multichip directly every round,
    # so the fast tier does not duplicate its 8-device compiles
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
