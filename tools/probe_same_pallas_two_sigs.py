"""Probe: does the jax-0.9 dispatch-cache bug trigger when TWO different
jit signatures embed the SAME-shaped Pallas call?

Context (tools/repro_jax_dispatch_bug.py, NOTES.md): two jit signatures
each wrapping a Pallas-bearing trace poison the process — the second
signature's SECOND dispatch fails (CPU: buffer-count mismatch; TPU: wedges
the client).  Every known repro changes the PALLAS shape between the two
programs (different active-prefix widths resize the kernel grid/outputs).

The capacity-width-kernel plan (NOTES.md round 3) keeps the pallas_call at
a CONSTANT shape and re-buckets only the surrounding XLA stages (sorts,
lifecycle) — so the question this probe answers is whether the corruption
keys on the embedded Pallas executable's shape (constant here → safe) or
on the outer jit signature (differs per bucket → still broken).

Run on CPU (interpret-mode Pallas reproduces the bug per the repro file)
and on TPU.  Prints SAFE or reproduces the failure.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CAP = 1024  # constant pallas width
B = 128


def _kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] * 2.0 + 1.0


def pallas_fixed(x):  # x: (16, CAP) always
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((16, CAP), jnp.float32),
        grid=(CAP // B,),
        in_specs=[pl.BlockSpec((16, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x)


@functools.partial(jax.jit, static_argnums=1)
def step_bucket(x, width, frame):
    """Different `width` -> different jit signature + different XLA shapes,
    but the embedded pallas_call is always (16, CAP)."""
    pad = jnp.zeros((16, CAP - width), jnp.float32)
    full = jnp.concatenate([x, pad], axis=1)
    out = pallas_fixed(full)
    return out[:, :width] + jnp.float32(frame)


def pallas_var(x, width):  # pallas shape tracks the bucket width
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((16, width), jnp.float32),
        grid=(width // B,),
        in_specs=[pl.BlockSpec((16, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x)


@functools.partial(jax.jit, static_argnums=1)
def step_bucket_var(x, width, frame):
    """CONTROL: the pallas shape itself differs per bucket — the known-bad
    configuration (every repro of the dispatch bug changes pallas shapes)."""
    return pallas_var(x, width)[:, :width] + jnp.float32(frame)


def control():
    w1, w2 = 512, 768
    x1 = jnp.ones((16, w1), jnp.float32)
    x2 = jnp.ones((16, w2), jnp.float32)
    r = step_bucket_var(x1, w1, jnp.int32(0)); np.asarray(r[:2, :2])
    r = step_bucket_var(x1, w1, jnp.int32(1)); np.asarray(r[:2, :2])
    r = step_bucket_var(x2, w2, jnp.int32(2)); np.asarray(r[:2, :2])
    r = step_bucket_var(x2, w2, jnp.int32(3)); np.asarray(r[:2, :2])
    for f in range(4, 10):
        x, w = (x1, w1) if f % 2 else (x2, w2)
        r = step_bucket_var(x, w, jnp.int32(f))
        assert np.allclose(np.asarray(r), 3.0 + f)
    print("CONTROL (two pallas shapes) did NOT fail — this toy does not "
          "tickle the dispatch bug; the SAFE result is INCONCLUSIVE",
          flush=True)


def main():
    if "--control" in sys.argv:
        return control()
    w1, w2 = 512, 768
    x1 = jnp.ones((16, w1), jnp.float32)
    x2 = jnp.ones((16, w2), jnp.float32)

    r = step_bucket(x1, w1, jnp.int32(0))
    np.asarray(r[:2, :2])
    r = step_bucket(x1, w1, jnp.int32(1))
    np.asarray(r[:2, :2])
    print("bucket A (512) dispatched twice: ok", flush=True)

    r = step_bucket(x2, w2, jnp.int32(2))
    np.asarray(r[:2, :2])
    print("bucket B (768) first dispatch: ok", flush=True)
    r = step_bucket(x2, w2, jnp.int32(3))  # the repro's failure point
    np.asarray(r[:2, :2])
    print("bucket B second dispatch: ok", flush=True)

    # interleave back and forth a few times, checking values
    for f in range(4, 10):
        x, w = (x1, w1) if f % 2 else (x2, w2)
        r = step_bucket(x, w, jnp.int32(f))
        got = np.asarray(r)
        expect = 3.0 + f
        assert np.allclose(got, expect), (f, got[0, 0], expect)
    print(f"SAFE on {jax.default_backend()}: same-shaped pallas_call in two "
          f"jit signatures, interleaved dispatches, values correct",
          flush=True)


if __name__ == "__main__":
    main()
