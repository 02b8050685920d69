"""The driver entry points must stay importable and executable."""

import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    q, v = out
    assert q.shape == (1024, 3) and v.shape == (1024, 3)
    assert bool(np.isfinite(np.asarray(q)).all())


def test_dryrun_multichip_8():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as g
    g.dryrun_multichip(4)
    g.dryrun_multichip(1)
