"""Tiny cached-matmul TPU probe (CLAUDE.md relay-wedge discipline).

Exit 0 = the relay answered a trivial device program; nonzero/timeout = the
relay is down or wedged.  Run under `timeout`; probe at most every ~30 min —
rapid probing enqueues more stuck clients and prolongs a wedge.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()
from dss_tpu.utils.platform import setup_jax  # noqa: E402

setup_jax()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("devices:", jax.devices(), flush=True)
x = jnp.ones((256, 256))
y = (x @ x).block_until_ready()
print(f"probe ok in {time.time() - t0:.1f}s sum={float(y.sum())}", flush=True)
