"""The driver contract file must work on the virtual 8-device CPU mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    ge.dryrun_multichip(4)


def test_entry_lowers():
    fn, args = ge.entry()
    # abstract lowering only (full 1.3B execution is a TPU-side check)
    jax.jit(fn).lower(*args)
