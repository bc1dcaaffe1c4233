"""Driver-contract smoke tests: entry() compiles and dryrun_multichip runs
a real sharded training step on the fake 8-device CPU mesh."""

import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    coeffs, image, lmk = out
    assert coeffs.shape[1] == 257
    assert image.shape[1:] == (224, 224, 3)
    assert lmk.shape[1:] == (68, 2)
    assert np.isfinite(np.asarray(coeffs)).all()
