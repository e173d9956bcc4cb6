"""Driver-contract checks: entry() compiles single-chip; dryrun_multichip
runs on the virtual 8-device mesh."""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    for o in out:
        assert jax.numpy.isfinite(o).all()


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
