"""The driver's entry points (__graft_entry__.py) are a release gate: the
single-chip compile check and the 8-device dry run of every compiled step
variant must keep passing as step signatures/wire formats evolve."""

import numpy as np


def test_entry_compiles():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
