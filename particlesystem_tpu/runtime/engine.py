"""Packed-state frame engine: the production sim loop for emitter scenes.

One jitted function per frame — spawn-row generation, the fused Pallas
physics kernel, recycling bookkeeping and spawn writes — with zero host
round trips (the reference reads ``gridmax`` back every frame,
``particleSystem.cpp:1900``; here even the recycling bookkeeping stays on
device).

Two allocation policies (``alloc=``):

* ``"exact"`` — dead slots ascending, refreshed every ``refresh_interval``
  frames by cumsum compaction.  ``refresh_interval=1`` reproduces
  ``models/emitter.step_core`` bit-for-bit (the parity tests rely on it);
  larger K amortizes the O(N) compaction with <=K frames recycling latency.
* ``"ring"`` — slots reused in spawn order through a ring cursor; O(S) per
  frame with no O(N) bookkeeping at all.  The production/bench default:
  at 10M particles the exact policy's compaction would dominate the frame.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import EmitterSceneConfig
from ..models import emitter as em
from ..ops import pallas_step as ps


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EngineState:
    packed: jax.Array      # (8, N [+ shadow]) f32
    accum: jax.Array       # (n_emitters,) f32 fractional spawn credit
    free_list: jax.Array   # (L,) int32 dead slots, padded with N (exact mode)
    cursor: jax.Array      # scalar int32: consumed entries / ring position
    n_free: jax.Array      # scalar int32: valid free-list entries
    frame: jax.Array       # scalar int32


class PackedEngine:
    """Frame loop over packed (8, N) state."""

    def __init__(self, cfg: EmitterSceneConfig, refresh_interval: int = 1,
                 free_list_size: Optional[int] = None, alloc: str = "exact"):
        if alloc not in ("exact", "ring"):
            raise ValueError(f"unknown alloc policy {alloc!r}")
        self.cfg = cfg
        self.alloc = alloc
        self.refresh_interval = int(refresh_interval)
        budget = cfg.max_spawn_per_step * self.refresh_interval
        self.free_list_size = int(free_list_size or max(1024, 4 * budget))
        # ring mode: shadow region sized to the (padded) spawn budget
        self.shadow = _round_up(cfg.max_spawn_per_step, 1024) if alloc == "ring" else 0
        self.total_cols = cfg.slots + self.shadow
        self._step = jax.jit(self._frame, donate_argnums=0)
        self._step_many = {}

    def init(self, packed: Optional[jax.Array] = None) -> EngineState:
        n = self.cfg.slots
        if packed is None:
            packed = jnp.zeros((8, n), jnp.float32)
        if packed.shape == (8, n) and self.shadow:
            packed = jnp.concatenate(
                [packed, jnp.zeros((8, self.shadow), jnp.float32)], axis=1)
        assert packed.shape == (8, self.total_cols), packed.shape
        fl, n_free = ps.refresh_free_list(packed, self.free_list_size)
        return EngineState(
            packed=packed,
            accum=jnp.zeros((max(1, len(self.cfg.emitters)),), jnp.float32),
            free_list=fl, cursor=jnp.int32(0), n_free=n_free,
            frame=jnp.int32(0),
        )

    # ------------------------------------------------------------------
    def _frame(self, s: EngineState) -> EngineState:
        cfg = self.cfg
        spawn, accum = em.spawn_fields(cfg, s.frame, s.accum)
        packed = ps.fused_step(s.packed, cfg)
        rows = ps.pack_spawn_rows(spawn)

        if self.alloc == "ring":
            pad = self.shadow - rows.shape[1]
            if pad:
                rows = jnp.pad(rows, ((0, 0), (0, pad)))
                valid = jnp.pad(spawn.valid, (0, pad))
            else:
                valid = spawn.valid
            packed, cursor = ps.ring_spawn(packed, rows, valid, s.cursor,
                                           cfg.slots)
            free_list, n_free = s.free_list, s.n_free
        else:
            def refresh(_):
                fl, nf = ps.refresh_free_list(packed, self.free_list_size)
                return fl, nf, jnp.int32(0)

            def keep(_):
                return s.free_list, s.n_free, s.cursor

            do = (s.frame % self.refresh_interval) == 0
            free_list, n_free, cursor = jax.lax.cond(do, refresh, keep, None)
            packed, cursor = ps.spawn_packed(packed, rows, spawn.valid,
                                             free_list, cursor, n_free)

        return EngineState(packed=packed, accum=accum, free_list=free_list,
                           cursor=cursor, n_free=n_free, frame=s.frame + 1)

    # ------------------------------------------------------------------
    def step(self, s: EngineState) -> EngineState:
        return self._step(s)

    def step_many(self, s: EngineState, k: int) -> EngineState:
        """Run ``k`` frames in one device dispatch (``fori_loop``); the tool
        of choice when per-call dispatch latency would dominate (remote or
        heavily pipelined execution)."""
        if k not in self._step_many:
            self._step_many[k] = jax.jit(
                lambda st: jax.lax.fori_loop(
                    0, k, lambda _, x: self._frame(x), st),
                donate_argnums=0)
        return self._step_many[k](s)

    def alive_count(self, s: EngineState) -> jax.Array:
        age = s.packed[6, : self.cfg.slots]
        life = s.packed[7, : self.cfg.slots]
        return jnp.sum(((age <= life) & (life > 0)).astype(jnp.int32))
