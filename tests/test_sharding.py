"""Multi-chip sharding dry-run on the virtual 8-device CPU mesh."""

import jax
import pytest


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from trgt_tpu.engine.sharding import dryrun
    dryrun(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
