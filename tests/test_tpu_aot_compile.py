"""Chipless Mosaic/TPU AOT compile checks.

The CPU-backend test suite runs the Pallas kernels in interpret mode,
which skips Mosaic entirely — a kernel edit can pass every CPU test
and still crash Mosaic on the real chip (layout/relayout rules, iota
typing, lane alignment). These tests compile the kernels against an
abstract v5e topology (jax.experimental.topologies) on the CPU
backend: no chip needed, and Mosaic failures surface as test
failures. Each compile runs in a SUBPROCESS because Mosaic aborts the
process (SIGABRT) on some failure classes instead of raising.
"""

import subprocess
import sys

import pytest

SNIPPET = """
import sys, functools
sys.path.insert(0, {repo!r})
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import jax.numpy as jnp
topo = topologies.get_topology_desc(
    "v5e:1x1x1", "tpu", chips_per_host_bounds=[1, 1, 1])
mesh = Mesh(np.array(topo.devices).reshape(1), ("x",))
s = NamedSharding(mesh, P())
{body}
lowered = jax.jit(fn, in_shardings=s, out_shardings=s).lower(*args)
lowered.compile()
print("AOT_OK")
"""

SPAN_FULL = """
from trgt_tpu.kernels.semiglobal_pallas import _semiglobal_pallas
fn = functools.partial(_semiglobal_pallas, interpret=False, packed=True)
B, Pp, W = 8, 128, 512
args = (jax.ShapeDtypeStruct((B, Pp // 2), jnp.uint8),
        jax.ShapeDtypeStruct((B, W // 2), jnp.uint8),
        jax.ShapeDtypeStruct((3,), jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.int32))
"""

SPAN_SEG = """
from trgt_tpu.kernels.semiglobal_pallas import _semiglobal_pallas_seg
fn = functools.partial(_semiglobal_pallas_seg, seg=64, interpret=False,
                       packed=True)
B, Pp, W = 8, 128, 512
args = (jax.ShapeDtypeStruct((B, Pp // 2), jnp.uint8),
        jax.ShapeDtypeStruct((B, W // 2), jnp.uint8),
        jax.ShapeDtypeStruct((3,), jnp.float32),
        jax.ShapeDtypeStruct((B, 128), jnp.int32))
"""


def _aot_compile(body: str) -> None:
    import os
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # no plugin registration
    env["JAX_PLATFORMS"] = "cpu"
    code = SNIPPET.format(repo=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), body=body)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, timeout=480, env=env)
    assert b"AOT_OK" in proc.stdout, (
        f"rc={proc.returncode}\n{proc.stderr.decode()[-2500:]}")


def test_span_full_kernel_compiles_for_tpu():
    _aot_compile(SPAN_FULL)


def test_span_segmented_kernel_compiles_for_tpu():
    _aot_compile(SPAN_SEG)
