"""Driver entry points (__graft_entry__): the deliverables the round driver
actually invokes — entry() must be jittable on one device, and
dryrun_multichip(n) must provision its own n-device virtual mesh and run a
real sharded train step even when fewer physical devices exist
(VERDICT r1 task 1)."""
from __future__ import annotations

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from __graft_entry__ import dryrun_multichip, entry  # noqa: E402


def test_entry_returns_jittable_forward():
    fn, args = entry()
    # trace-only check (no compile): shapes of the SSD300 head outputs
    loc, cls = jax.eval_shape(fn, *args)
    batch = args[1].shape[0]
    assert loc.shape == (batch, 8732, 4)
    assert cls.shape == (batch, 8732, 6)


@pytest.mark.slow
def test_dryrun_multichip_provisions_virtual_mesh(capfd):
    # The test process runs on the CPU backend with 8 virtual devices
    # (conftest), so this exercises the inline path; the subprocess
    # fallback (single real device) is what the driver exercises and was
    # validated there.
    dryrun_multichip(8)
    out = capfd.readouterr().out
    assert "dryrun_multichip(8): ok" in out
