"""The driver contract: entry() compiles single-device; dryrun_multichip(8) executes
a full sharded train step on the virtual CPU mesh."""

import sys
import pathlib

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    assert compiled is not None


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
