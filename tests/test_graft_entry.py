"""Driver entry points (__graft_entry__.py) — the harness's only
multi-chip correctness artifact (round-1 VERDICT: its failure was the
round's one hard failure). Exercise both hooks every suite run so a
regression is caught before the driver does."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402


def test_entry_is_single_jit_compilable():
    fn, args = graft.entry()
    jax.jit(fn).lower(*args).compile()


def test_dryrun_multichip_8():
    # The driver runs exactly this with 8 virtual CPU devices; the call
    # asserts dense/streaming/factored agreement internally.
    graft.dryrun_multichip(8)
