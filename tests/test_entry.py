"""Driver entry points stay green (single-chip step + multichip dryrun)."""

import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
