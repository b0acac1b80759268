"""Driver entry points keep working (single-chip forward + multichip dryrun)."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    is_het, major, second, p1, p2, l1, l2 = out
    assert is_het.shape == major.shape == p1.shape
    assert str(p1.dtype) == "float64"


def test_dryrun_multichip_eight_devices(capsys):
    graft.dryrun_multichip(8)
    assert "dryrun_multichip(8)" in capsys.readouterr().out
