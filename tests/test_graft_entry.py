"""The driver's gates: entry() must jit single-chip, dryrun_multichip(n)
must build a virtual n-device CPU mesh and run a full sharded train step
regardless of the caller's backend state.

Round-1 regression: dryrun_multichip ran inline and inherited the
sitecustomize-pinned axon (TPU) platform, crashing on libtpu version
mismatch (MULTICHIP_r01.json rc=1).  It now always spawns a forced-CPU
subprocess; these tests import __graft_entry__ so the entry file can
never again ship un-executed.
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def test_dryrun_multichip_8_devices(capfd):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)   # raises on subprocess failure
    out = capfd.readouterr().out
    assert "dryrun_multichip(8) ok" in out
    assert "fold-parallel ok" in out


def test_entry_returns_jittable_forward():
    import jax
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    probs = np.asarray(out)
    assert probs.shape == (8, 2, 101, 101)
    assert np.isfinite(probs).all()
    assert (probs >= 0).all() and (probs <= 1).all()
