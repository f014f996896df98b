"""Measure ACTUAL candidate-packing statistics of the cluster-pair kernel
at 1M steady state on the TPU: per (b, ch) config, the total chunk count,
candidate pair-slots (sum(nact) * b * ch), and the genuine stencil pairs
(sum_c count_c * sum_{27-stencil} count_n from the cell histogram) — the
ground truth for the packing-efficiency roofline (NOTES.md).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from particlesystem_tpu.core.config import NBodyConfig, GridSpec  # noqa: E402
from particlesystem_tpu.models import nbody  # noqa: E402
from particlesystem_tpu.ops import neighbor_blocks as nbk  # noqa: E402
from particlesystem_tpu.ops.grid import coords_to_cell, wrap_positions  # noqa: E402


def main():
    n_fill = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    gd = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = NBodyConfig(n_fill=n_fill, grid=GridSpec(grid_dim=gd))
    state = nbody.init_fill(cfg)
    step = jax.jit(partial(nbody.step, cfg=cfg, impl="blocks"))
    for f in range(3):
        state, stats = step(state, jnp.int32(f))
    alive = int(stats.n_alive)
    print(f"alive = {alive}", flush=True)

    pos_w, coords = wrap_positions(state.pos, cfg.grid)
    cell = coords_to_cell(coords, cfg.grid)

    # genuine stencil pairs from the cell histogram
    prep = jax.jit(lambda *a: nbk.prepare(*a, cfg))
    _, chunks, _, _, max_occ, counts, _ = prep(
        state.pos, state.age, state.w, cell, state.alive)
    cnt = np.asarray(counts)[: cfg.grid.num_cells].reshape(gd, gd, gd)
    stencil = np.zeros_like(cnt)
    for o3 in (-1, 0, 1):
        for o1 in (-1, 0, 1):
            for o2 in (-1, 0, 1):
                sl = np.zeros_like(cnt)
                src = cnt[
                    max(0, -o3): cnt.shape[0] - max(0, o3),
                    max(0, -o1): cnt.shape[1] - max(0, o1),
                    max(0, -o2): cnt.shape[2] - max(0, o2)]
                sl[max(0, o3): cnt.shape[0] - max(0, -o3),
                   max(0, o1): cnt.shape[1] - max(0, -o1),
                   max(0, o2): cnt.shape[2] - max(0, -o2)] = src
                stencil += sl
    genuine = float((cnt.astype(np.float64) * stencil).sum())
    print(f"genuine stencil pairs: {genuine:.3e}  max_occ {int(max_occ)}",
          flush=True)

    for b, ch in ((512, 1024), (256, 512), (256, 640), (256, 768),
                  (128, 512), (512, 512), (1024, 1024)):
        try:
            _, chunks, *_ = jax.jit(
                lambda *a, _b=b, _ch=ch: nbk.prepare(*a, cfg, b=_b, ch=_ch)
            )(state.pos, state.age, state.w, cell, state.alive)
        except Exception as e:  # noqa: BLE001
            print(f"b{b} ch{ch}: prepare failed: {type(e).__name__}")
            continue
        carr = np.asarray(chunks)
        nact = carr[:, 0, 3].astype(np.int64)
        live = int((nact > 0).sum())
        total_chunks = int(nact.sum())
        cand = total_chunks * b * ch
        # column-subtile model: per chunk the kernel computes ceil(hi/ts)
        # subtiles of b*ts lanes instead of the full b*ch tile — the padded
        # tail [hi, ch) is skipped (ops/neighbor_blocks.py ts knob)
        his = np.concatenate([carr[i, : nact[i], 2] for i in range(len(nact))
                              if nact[i] > 0]).astype(np.int64)
        sub = ""
        for ts in (256, 128):
            cand_ts = int((np.ceil(his / ts) * ts).sum()) * b
            sub += f"  ts{ts} eff {genuine / cand_ts:.1%}"
        print(f"b{b:5d} ch{ch:5d}: blocks {len(nact):5d} live {live:5d} "
              f"chunks {total_chunks:7d} ({total_chunks / max(live, 1):.1f}/blk) "
              f"cand {cand:.3e}  eff {genuine / cand:.1%}{sub}", flush=True)


if __name__ == "__main__":
    main()
