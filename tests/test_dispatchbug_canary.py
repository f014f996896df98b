"""Regression canary for the jax-0.9 dispatch-cache bug (VERDICT r3 #6).

History: the containment (``utils/dispatchbug.py``: recovering_call, the
single-Pallas-shape gate, the frozen active prefix) existed because
``tools/repro_jax_dispatch_bug.py`` reproduced on the installed jax and the
production-scale probe (``tools/probe_multi_shape_1m.py``) wedged the real
TPU client.  Round 5 found and fixed the ROOT CAUSE — a module-level
concrete jax scalar in ``ops/neighbor_blocks.py`` shared as a constant
across traces (38c82ae) — after which the repro prints OK and the
production probe survives 60 frames across 4 Pallas shapes on the chip.
``multi_pallas_shapes_safe()`` now defaults to True with the
``PSTPU_SINGLE_PALLAS=1`` kill-switch.

These tests WATCH FOR REGRESSION: if the repro ever reproduces again (a
jax change, or someone reintroducing a module-level jax-array constant
into kernel code), the canary fails and points at the kill-switch + the
containment re-enable notes in utils/dispatchbug.py.
"""

import os
import subprocess
import sys

from particlesystem_tpu.utils.dispatchbug import multi_pallas_shapes_safe

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # follow the test env onto CPU
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


def test_repro_stays_fixed():
    """The minimal two-signature repro must keep printing OK.  If this
    fails, the dispatch-cache corruption is BACK: set
    ``PSTPU_SINGLE_PALLAS=1`` to restore the frozen single-shape
    containment, then hunt for a reintroduced module-level jax-array
    constant in traced code (the round-5 root cause) or a jax change."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "repro_jax_dispatch_bug.py")],
        capture_output=True, text=True, env=_child_env(), cwd=REPO,
        timeout=600)
    assert proc.returncode == 0 and "OK" in proc.stdout, (
        "tools/repro_jax_dispatch_bug.py REPRODUCES again — the dispatch-"
        "cache corruption is back. Set PSTPU_SINGLE_PALLAS=1 (restores the "
        "frozen single-shape containment, utils/dispatchbug.py) and check "
        "for a reintroduced module-level jax-array constant in kernel "
        f"code:\n{proc.stderr[-2000:]}")


def test_kill_switch_restores_containment():
    """PSTPU_SINGLE_PALLAS=1 must flip the gate back off — the containment
    machinery (frozen prefix, claim ledger, autosize refusal) is dormant,
    not deleted, and this is the wire that re-arms it."""
    assert multi_pallas_shapes_safe()
    os.environ["PSTPU_SINGLE_PALLAS"] = "1"
    try:
        assert not multi_pallas_shapes_safe()
    finally:
        del os.environ["PSTPU_SINGLE_PALLAS"]


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
    two Pallas-bearing shapes.  Verify the promise in a clean subprocess;
    a mismatch in either direction means the gate answers wrong for this
    backend."""
    safe = multi_pallas_shapes_safe()
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE], capture_output=True, text=True,
        env=_child_env(), cwd=REPO, timeout=900)
    ok = proc.returncode == 0 and "TWO-SHAPE-OK" in proc.stdout
    assert ok == safe, (
        f"multi_pallas_shapes_safe()={safe} but the two-shape probe "
        f"{'succeeded' if ok else 'failed'}:\n{proc.stderr[-2000:]}")
