"""The driver entry points compile and run on the CPU fixture."""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__  # noqa: E402


def test_entry_compiles_single_device() -> None:
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024,)
    assert bool(np.isfinite(np.asarray(out)).all())


def test_dryrun_multichip_8() -> None:
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_odd_count() -> None:
    __graft_entry__.dryrun_multichip(3)
