"""Multi-chip sharding paths on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax


def test_virtual_devices_available():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles_small():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(float(out["force_N"]))
    # synthetic dent must register as contact
    assert float(out["max_depth_mm"]) > 0.01
