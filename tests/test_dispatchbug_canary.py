"""Canary for the jax-0.9 dispatch-cache bug containment (VERDICT r3 #6).

The containment (``utils/dispatchbug.py``: recovering_call, the
single-Pallas-shape gate, the frozen active prefix) exists ONLY because
``tools/repro_jax_dispatch_bug.py`` reproduces on the installed jax.  These
tests bind the two together: a jax upgrade that fixes the bug makes the
repro print OK, which FAILS the canary and triggers the deletion procedure
(NOTES.md "dispatch-bug deletion procedure").  Until then, the two-shape
probe pins that ``multi_pallas_shapes_safe()``'s answer for this backend is
actually true — on CPU, two Pallas-bearing shapes must be re-dispatchable
under ``recovering_call``.
"""

import os
import subprocess
import sys

import pytest

from particlesystem_tpu.utils.dispatchbug import multi_pallas_shapes_safe

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # follow the test env onto CPU
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


def test_repro_still_reproduces_else_delete_containment():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "repro_jax_dispatch_bug.py")],
        capture_output=True, text=True, env=_child_env(), cwd=REPO,
        timeout=600)
    if proc.returncode == 0 and "OK" in proc.stdout:
        pytest.fail(
            "tools/repro_jax_dispatch_bug.py printed OK — the jax "
            "dispatch-cache bug is FIXED on this jax. Run the deletion "
            "procedure (NOTES.md 'dispatch-bug deletion procedure'): drop "
            "utils/dispatchbug.py, the recovering_call sites, the frozen "
            "active prefix and the per-process bench/profile subprocess "
            "splits, then delete this canary.")
    # bug still present: the containment stays
    assert proc.returncode != 0


_PROBE = """
import jax, jax.numpy as jnp
from particlesystem_tpu.core.config import GridSpec, NBodyConfig
from particlesystem_tpu.models import nbody
from particlesystem_tpu.utils.dispatchbug import recovering_call

def run(capacity):
    cfg = NBodyConfig(n_fill=400, capacity=capacity,
                      grid=GridSpec(grid_dim=8, chunk_factor=2),
                      particle_life=2.0, seed=5)
    st = nbody.init_fill(cfg)
    step = jax.jit(lambda s, f: nbody.step(s, f, cfg, 0, "blocks", 0))
    for f in range(3):  # >= 2 dispatches of each Pallas shape
        st, _ = recovering_call(step, st, jnp.int32(f))

run(1024)   # Pallas shape A, dispatched repeatedly
run(2048)   # Pallas shape B, dispatched repeatedly
print("TWO-SHAPE-OK")
"""


def test_two_shape_probe_matches_safe_answer():
    """``multi_pallas_shapes_safe()`` promises this backend can re-dispatch
    two Pallas-bearing shapes (with recovering_call absorbing the one
    poisoned dispatch per switch).  Verify the promise in a clean
    subprocess; if this starts failing on CPU, the containment gate is
    WRONG for this backend and the frozen-prefix mode must extend to it."""
    safe = multi_pallas_shapes_safe()
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True,
        env=_child_env(), cwd=REPO, timeout=900)
    ok = proc.returncode == 0 and "TWO-SHAPE-OK" in proc.stdout
    assert ok == safe, (
        f"multi_pallas_shapes_safe()={safe} but the two-shape probe "
        f"{'succeeded' if ok else 'failed'}:\n{proc.stderr[-2000:]}")
