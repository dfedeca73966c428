"""Driver contract smoke tests: __graft_entry__.entry() compiles single-
device; dryrun_multichip(8) runs on the virtual CPU mesh."""

import sys

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


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
