"""Render-loop demo: fountain scene -> PNG frames via the async readback ring.

BASELINE config-5 shape in miniature: emitters + full force stack + ground
plane, with the double-buffered `AsyncReadback` publisher so the sim loop
never syncs with the "display" (here: a PNG splatter).  The reference's
closest analog is the per-stage ``pmFetchMemory`` host pulls
(``particleSystem.cpp:1781-1786``), which are synchronous.

Usage:  python examples/fountain_render.py [out_dir] [n_frames]
        (CPU works: JAX_PLATFORMS=cpu python examples/fountain_render.py)

Writes out_dir/frame_####.png every RENDER_EVERY sim frames plus a final
contact sheet, and prints the published/dropped ring statistics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from particlesystem_tpu.api import ParticleSystem

RENDER_EVERY = 6          # sim frames per rendered frame
IMG = 512                 # output image side, pixels
EXTENT = 12.0             # world half-width of the view
N_FIELDS = 8              # packed8 layout rows: x y z vx vy vz age life


def splat(packed: np.ndarray, path: str) -> int:
    """Project alive particles to an (x, y) brightness image -> PNG."""
    from PIL import Image

    x, y, age, life = packed[0], packed[1], packed[6], packed[7]
    alive = (age <= life) & (life > 0)
    fade = np.where(alive, 1.0 - age / np.maximum(life, 1e-6), 0.0)
    img, _, _ = np.histogram2d(
        y[alive], x[alive], bins=IMG,
        range=[[-1.0, 2 * EXTENT - 1.0], [-EXTENT, EXTENT]],
        weights=fade[alive])
    img = np.log1p(img[::-1])            # y up; log for dynamic range
    img = (img / max(img.max(), 1e-6) * 255).astype(np.uint8)
    Image.fromarray(img, mode="L").save(path)
    return int(alive.sum())


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fountain_frames"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    os.makedirs(out_dir, exist_ok=True)

    ps = (ParticleSystem(capacity=200_000, dt=1 / 60,
                         gravity=(0.0, -9.8, 0.0), wind=(1.5, 0.0, 0.0),
                         drag=0.1)
          .add_emitter(pos=(0.0, 0.5, 0.0), direction=(0.0, 1.0, 0.0),
                       cone_angle=0.25, speed=12.0, rate=120_000.0,
                       life_min=1.5, life_max=3.0)
          .add_emitter(pos=(4.0, 0.5, 0.0), direction=(-0.3, 1.0, 0.0),
                       cone_angle=0.15, speed=9.0, rate=60_000.0,
                       life_min=1.0, life_max=2.0)
          .add_plane(point=(0, 0, 0), normal=(0, 1, 0),
                     restitution=0.55, friction=0.2)
          .add_sphere(center=(2.0, 3.0, 0.0), radius=1.0,
                      restitution=0.5, friction=0.1))

    rb = ps.enable_readback(depth=3)     # publisher: sim never blocks on IO
    shape = (N_FIELDS, ps.config.slots)

    written = 0
    for f in range(0, n_frames, RENDER_EVERY):
        ps.step(RENDER_EVERY)            # one device batch; publishes the
        host = rb.ring.pop(shape)        # PREVIOUS batch's frame async
        if host is None:
            continue                     # ring empty: render skips, sim runs
        alive = splat(host, os.path.join(out_dir, f"frame_{written:04d}.png"))
        written += 1
        if written % 10 == 1:
            print(f"sim frame {f:4d}: alive={alive}  ring fill="
                  f"{rb.ring.fill()}", flush=True)
    rb.flush()

    print(f"done: {written} PNGs in {out_dir}  "
          f"(published={rb.published} dropped={rb.dropped} "
          f"alive={ps.alive_count()})")


if __name__ == "__main__":
    main()
