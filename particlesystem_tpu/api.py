"""User-facing API.

``ParticleSystem`` is the emitter-scene engine (scene/state API of the
BASELINE configs: emitter params, force list, dt, particle capacity) and
``NBodySimulation`` is the reference simulation driver (the equivalent of
``DoParallelProcess``, ``/root/reference/source/code/src/particleSystem.cpp:1733-1986``,
with per-phase timing; ``run(batch=k)`` runs sync-free — on-device guard
accumulation, one host readback per batch — while ``run()`` keeps
per-frame stat readbacks for per-frame reactions).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import (Emitter, EmitterSceneConfig, NBodyConfig,
                          PlaneCollider, SphereCollider)
from .models import nbody
from .runtime import checkpoint
from .runtime.engine import PackedEngine
from .runtime.readback import AsyncReadback
from .utils.dispatchbug import multi_pallas_shapes_safe, recovering_call
from .utils.timers import PhaseTimers


def auto_batch(num_iterations: int, cap: int = 16) -> int:
    """Default batching policy for ``run(batch=0)``: the largest divisor of
    ``num_iterations`` that is <= ``cap`` — one host sync per batch, and the
    reference's own 10-iteration run length (common.h:69) becomes a single
    sync-free device-side loop.  Falls back to 1 (per-frame) only when
    ``num_iterations`` has no divisor in [2, cap] (e.g. a prime > cap)."""
    for b in range(min(cap, num_iterations), 0, -1):
        if num_iterations % b == 0:
            return b
    return 1


class ParticleSystem:
    """Builder + runner for emitter scenes.

    >>> ps = (ParticleSystem(capacity=1_000_000, dt=1/60, gravity=(0,-9.8,0))
    ...       .add_emitter(pos=(0, 1, 0), rate=100_000, speed=9.0)
    ...       .add_plane(restitution=0.5, friction=0.2))
    >>> ps.step(600)
    >>> xyz = ps.positions()

    The first ``step()`` freezes the scene and compiles the fused kernel;
    adding emitters/colliders afterwards raises.
    """

    def __init__(self, capacity: int = 1 << 20, dt: float = 1 / 60,
                 gravity=(0.0, -9.8, 0.0), wind=(0.0, 0.0, 0.0),
                 drag: float = 0.0, seed: int = 1, alloc: str = "ring",
                 refresh_interval: int = 1, layout: str = "packed8"):
        self._base = dict(capacity=capacity, dt=dt, gravity=tuple(gravity),
                          wind=tuple(wind), drag=drag, seed=seed)
        self._emitters = []
        self._planes = []
        self._spheres = []
        self._alloc = alloc
        self._layout = layout
        self._refresh = refresh_interval
        self._engine: Optional[PackedEngine] = None
        self._es = None
        self.timers = PhaseTimers()
        self._readback: Optional[AsyncReadback] = None

    # -- scene construction -------------------------------------------------
    def add_emitter(self, **kw) -> "ParticleSystem":
        self._mutable()
        self._emitters.append(Emitter(**kw))
        return self

    def add_plane(self, **kw) -> "ParticleSystem":
        self._mutable()
        self._planes.append(PlaneCollider(**kw))
        return self

    def add_sphere(self, **kw) -> "ParticleSystem":
        self._mutable()
        self._spheres.append(SphereCollider(**kw))
        return self

    def _mutable(self):
        if self._engine is not None:
            raise RuntimeError("scene is frozen after the first step()")

    @property
    def config(self) -> EmitterSceneConfig:
        return EmitterSceneConfig(emitters=tuple(self._emitters),
                                  planes=tuple(self._planes),
                                  spheres=tuple(self._spheres), **self._base)

    def _ensure(self):
        if self._engine is None:
            self._engine = PackedEngine(self.config, alloc=self._alloc,
                                        refresh_interval=self._refresh,
                                        layout=self._layout)
            self._es = self._engine.init()

    # -- simulation ----------------------------------------------------------
    def step(self, n: int = 1) -> "ParticleSystem":
        self._ensure()
        with self.timers.phase("step"):
            if n > 1:
                self._es = self._engine.step_many(self._es, n)
            else:
                self._es = self._engine.step(self._es)
        if self._readback is not None:
            with self.timers.phase("readback"):
                self._readback.publish(self.packed())
        return self

    @property
    def frame(self) -> int:
        return 0 if self._es is None else int(self._es.frame)

    # -- state access ----------------------------------------------------------
    def packed(self) -> jax.Array:
        """Device (n_fields, capacity) packed state: x,y,z,vx,vy,vz then
        (age, life) on the packed8 layout or (death_frame,) on slim."""
        self._ensure()
        return jnp.stack(self._engine.flat_fields(self._es))

    def alive_mask(self) -> np.ndarray:
        p = np.asarray(self.packed())
        if self._engine.layout == "slim":
            return int(self._es.frame) < p[6]
        return (p[6] <= p[7]) & (p[7] > 0)

    def positions(self, alive_only: bool = True) -> np.ndarray:
        p = np.asarray(self.packed())
        xyz = p[0:3].T
        return xyz[self.alive_mask()] if alive_only else xyz

    def alive_count(self) -> int:
        self._ensure()
        return int(self._engine.alive_count(self._es))

    def fade(self) -> np.ndarray:
        """Per-particle alpha 1 - age/life (alive rows).  Needs the packed8
        layout: slim stores only the death frame (remaining lifetime is
        exact, the age/life ratio is not reconstructible)."""
        self._ensure()
        if self._engine.layout == "slim":
            raise RuntimeError("fade() needs layout='packed8'; the slim "
                               "layout does not carry age/life")
        p = np.asarray(self.packed())
        m = self.alive_mask()
        return 1.0 - p[6][m] / p[7][m]

    # -- render-loop readback -------------------------------------------------
    def enable_readback(self, depth: int = 3) -> AsyncReadback:
        self._ensure()
        frame_bytes = self._engine.n_fields * self._engine.cfg.slots * 4
        self._readback = AsyncReadback(frame_bytes, depth)
        return self._readback

    # -- persistence ------------------------------------------------------------
    def save(self, path: str) -> None:
        self._ensure()
        checkpoint.save(path, self._es,
                        meta=checkpoint.config_fingerprint(self.config))

    def load(self, path: str) -> "ParticleSystem":
        self._ensure()
        self._es, _ = checkpoint.load(path, self._es,
                                      expect_config=self.config)
        return self


class NBodySimulation:
    """Driver for the reference simulation — the ``DoParallelProcess``
    equivalent: initial uniform fill, then N iterations of the fused step,
    with per-phase timing and on-device stats (the reference's printf
    timings, ``particleSystem.cpp:1927``)."""

    BUCKETS = (64, 128, 192, 256, 384, 512, 768, 1024)

    def __init__(self, cfg: NBodyConfig = NBodyConfig(),
                 adaptive_width: bool = True, impl: str = "blocks",
                 active_bucketing: bool = True):
        self.cfg = cfg
        self.impl = impl
        self.adaptive_width = adaptive_width and impl == "dense"
        # occupancy-adaptive slot prefix: compact alive rows forward, then
        # run frames on a power-of-2 prefix sized to the live count — every
        # O(slots) stage (sorts, binning, lifecycle, RNG) scales with LIVE
        # particles (see nbody.compact_state; results identical by
        # construction, n_tail_alive guards the contract)
        self.active_bucketing = active_bucketing
        self.timers = PhaseTimers()
        with self.timers.phase("fill"):
            self.state = nbody.init_fill(cfg)
        self.frame = 0
        self.last_stats = None
        self.n_degraded_frames = 0  # frames whose neighbor pass truncated
        self._width = 0  # 0 = full cell_capacity (always exact)
        self._active = 0  # 0 = full slots
        self._frozen_active = False
        self._stepped = False
        self._step_jits = {}  # (width, impl, active) -> wrapper jit
        self._loop_jits = {}  # (width, impl, active, batch) -> batched jit
        self._compact_jit = None
        # Pallas program-shape ledger for single-Pallas-shape platforms
        # (utils/dispatchbug.py): the single-step program and a batch-k
        # loop are DIFFERENT Pallas-bearing shapes; mixing them in one
        # process wedges the TPU client, so the first dispatch pins the
        # shape and later mismatches raise a clear error instead.
        self._pallas_shape = None
        if self.active_bucketing and impl == "blocks" \
                and not multi_pallas_shapes_safe():
            # This platform wedges on the 2nd dispatch of a 2nd
            # Pallas-bearing program shape (utils/dispatchbug.py), so
            # dynamic re-bucketing is unavailable: pick the prefix ONCE
            # from the fill count (init_fill is already compacted — alive
            # rows occupy [0, n_fill)) and keep that single step shape for
            # the whole process.  Population only decays from the fill in
            # the reference configs, so containment holds; n_tail_alive
            # guards row containment every frame and n_spawn_capped guards
            # prefix free-slot saturation (a GROWING population can exhaust
            # the frozen prefix's headroom without ever touching the tail —
            # run() fails loudly instead of silently capping spawns).
            self._active = self._pick_active(cfg.n_fill)
            self._frozen_active = True

    def _pick_width(self, max_occ: int) -> int:
        """Bucketized list width with 25% headroom over the last observed
        max cell occupancy — the reference's per-frame gridmax readback
        (``particleSystem.cpp:1900``) serving the same purpose.  The dense
        neighbor pass costs O(width^2), so tracking real occupancy instead
        of the kill cap is a large win (520 -> ~192 at reference steady
        state ~= 7x fewer pair ops)."""
        want = int(max_occ * 1.25) + 8
        for b in self.BUCKETS:
            if b >= want:
                return min(b, self.cfg.cell_capacity)
        return 0  # full capacity

    def _step_fn(self):
        """Per-(width, impl) WRAPPER jit around ``nbody.step``.

        jax 0.9 dispatch-cache bug management (minimal repro:
        tools/repro_jax_dispatch_bug.py): dispatching the raw
        ``static_argnums`` module-level ``nbody.step`` poisons every
        subsequently-compiled program in the process — their re-dispatches
        return buffers that fail with a backend InvalidArgument on first
        dereference (observed with the staged ``profile_frame`` pieces).
        Nested wrapper jits (``jax.jit`` around the already-jitted step)
        collapse to one program at trace time and coexist cleanly with any
        number of other jits, so every consumer here goes through these
        wrappers and the raw module jit is never dispatched by the driver."""
        key = (self._width, self.impl, self._active)
        fn = self._step_jits.get(key)
        if fn is None:
            w, impl, cfg = self._width, self.impl, self.cfg
            act = self._active
            fn = jax.jit(lambda s, fr: nbody.step(s, fr, cfg, w, impl, act))
            self._step_jits[key] = fn
        return fn

    #: active-prefix granularity; see models/nbody.pick_active (shared with
    #: bench.py so the bench measures the production program shape)
    ACTIVE_QUANTUM = nbody.ACTIVE_QUANTUM

    def _pick_active(self, alive: int) -> int:
        return nbody.pick_active(self.cfg, alive, self.ACTIVE_QUANTUM)

    def _apply_bucketing(self, alive: int) -> None:
        if self._frozen_active:
            return  # single-Pallas-shape platform: prefix fixed at init
        want = self._pick_active(alive)
        want_rows = want or self.cfg.slots
        cur_rows = self._active or self.cfg.slots
        if want_rows < cur_rows:
            # shrink: compact alive rows into the prefix first
            if self._compact_jit is None:
                self._compact_jit = jax.jit(nbody.compact_state)
            with self.timers.phase("compact"):
                self.state = recovering_call(self._compact_jit, self.state)
            self._active = want
        elif want_rows > cur_rows:
            # grow (alive crept toward the prefix): pure re-slice, the
            # prefix invariant is preserved by containment
            self._active = want

    def _claim_shape(self, shape) -> None:
        """Pin the Pallas program shape on single-Pallas-shape platforms
        (see ``_pallas_shape``); no-op for shapes that carry no Pallas."""
        if self.impl != "blocks" or multi_pallas_shapes_safe():
            return
        if self._pallas_shape is None:
            self._pallas_shape = shape
        elif self._pallas_shape != shape:
            raise RuntimeError(
                f"this process already dispatched the {self._pallas_shape} "
                f"step program; dispatching {shape} as well would wedge the "
                f"TPU client (utils/dispatchbug.py) — keep one batch size "
                f"per process (validate()/run(batch=1) use the single-step "
                f"shape)")

    def _step_once(self, state, frame: int):
        # last-line recovery for the residual dispatch-cache flake (see
        # _step_fn and utils/dispatchbug.py)
        self._claim_shape(("single",))
        self._stepped = True
        return recovering_call(self._step_fn(), state, jnp.int32(frame))

    def _loop_fn(self, batch: int):
        """Per-(width, impl, active, batch) jit running ``batch`` frames in
        ONE device-side ``fori_loop`` with the contract guards accumulated
        on device — the host syncs once per batch, not once per frame (the
        sync-free loop ``bench.py`` measures, now the production path)."""
        key = (self._width, self.impl, self._active, batch)
        fn = self._loop_jits.get(key)
        if fn is None:
            w, impl, cfg = self._width, self.impl, self.cfg
            act = self._active

            def body(i, carry):
                s, _, mc, mt, nd = carry
                s2, st = nbody.step(s, i, cfg, w, impl, act)
                # accumulate the guards across EVERY frame: spawn capping
                # and drops are transient, so sampling only the final
                # frame's stats would let a mid-batch violation pass
                return (s2, st, jnp.maximum(mc, st.n_spawn_capped),
                        jnp.maximum(mt, st.n_tail_alive),
                        nd + st.n_listed_dropped)

            def loop(s, f0):
                s1, st1 = nbody.step(s, f0, cfg, w, impl, act)
                init = (s1, st1, st1.n_spawn_capped, st1.n_tail_alive,
                        st1.n_listed_dropped)
                s2, st, mc, mt, nd = jax.lax.fori_loop(
                    f0 + 1, f0 + batch, body, init)
                # ONE packed guard vector -> ONE host readback per batch
                guards = jnp.stack([mc, mt, nd, st.n_alive,
                                    st.max_cell_occupancy, st.n_spawned])
                return s2, st, guards

            fn = jax.jit(loop)
            self._loop_jits[key] = fn
        return fn

    def _run_batched(self, num_iterations: int, batch: int, verbose: bool):
        if num_iterations % batch:
            raise ValueError(f"num_iterations {num_iterations} must be a "
                             f"multiple of batch {batch}")
        for _ in range(num_iterations // batch):
            with self.timers.phase("step"):
                prev = self.state
                self._claim_shape(("loop", batch, self._width,
                                   self._active))
                self._stepped = True
                self.state, stats, guards = recovering_call(
                    self._loop_fn(batch), prev, jnp.int32(self.frame))
                g = np.asarray(guards)  # the batch's single host sync
                if int(g[2]) and self._width != 0:
                    # the adaptive width truncated some frame in the batch:
                    # REDO the whole batch from the saved state at full
                    # width, which is exact by construction — adaptive mode
                    # never keeps a degraded frame
                    self._width = 0
                    self.state, stats, guards = recovering_call(
                        self._loop_fn(batch), prev, jnp.int32(self.frame))
                    g = np.asarray(guards)
            mc, mt, nd = int(g[0]), int(g[1]), int(g[2])
            self.frame += batch
            self.last_stats = stats
            if mt:
                raise RuntimeError(
                    f"batch ending at frame {self.frame}: {mt} alive rows "
                    f"beyond active prefix {self._active}")
            if self._active and mc:
                raise RuntimeError(
                    f"batch ending at frame {self.frame}: active prefix "
                    f"{self._active} saturated — {mc} spawns capped that "
                    f"full width would grant"
                    + ("; checkpoint+reload in a fresh process to re-bucket"
                       if self._frozen_active else ""))
            if nd:
                self.n_degraded_frames += 1  # >=1 frame in this batch
                import warnings
                warnings.warn(
                    f"batch ending at frame {self.frame}: {nd} neighbor "
                    f"entries dropped — forces truncated (impl={self.impl});"
                    f" raise the chunk budget or cell capacity",
                    RuntimeWarning, stacklevel=3)
            if self.active_bucketing:
                self._apply_bucketing(int(g[3]))
            if self.adaptive_width and nd == 0:
                new_w = self._pick_width(int(g[4]))
                if new_w != self._width:
                    self._width = new_w
            if verbose:
                print(f"iter {self.frame}: alive={int(g[3])} "
                      f"last_spawned={int(g[5])} max_cell={int(g[4])} "
                      f"width={self._width or self.cfg.cell_capacity}")
        return self.last_stats

    def run(self, num_iterations: int = 10, verbose: bool = False,
            batch: int = 0):
        """Advance ``num_iterations`` frames.

        ``batch=0`` (the default) auto-batches: the largest divisor of
        ``num_iterations`` <= 16 (:func:`auto_batch`), so the sync-free
        loop below is what plain ``run()`` executes.  Pass ``batch=1``
        explicitly for per-frame readbacks and per-frame reactions (the
        debugging mode, and the shape ``validate()`` shares).

        ``batch=k`` (k > 1) runs the frames in device-side ``fori_loop``
        batches with the contract guards (``n_tail_alive``,
        ``n_spawn_capped``, ``n_listed_dropped``) accumulated on device and
        ONE host readback per batch — no per-frame host syncs, so the
        production loop runs at the benchmarked frame time (a relay sync
        costs ~25 ms on a remote-attached TPU, >50% of a 1M frame).
        Guards are evaluated at batch boundaries: violations raise/warn
        after at most ``k`` frames instead of 1, and a truncated adaptive-
        width batch is redone whole at full width (still exact, like the
        per-frame redo).  ``num_iterations`` must be a multiple of ``k``.
        ``batch=1`` keeps per-frame readbacks and per-frame reactions.

        On single-Pallas-shape platforms (utils/dispatchbug.py) the batch-k
        loop and the single step are different Pallas programs: the first
        dispatch pins the process to one shape, so pick ONE of
        ``run(batch=k)`` / ``run(batch=1)``+``validate()`` per process."""
        if batch == 0:
            batch = auto_batch(num_iterations)
            # on single-Pallas-shape platforms the first dispatched loop
            # shape pins the process (_claim_shape): auto-resolution
            # PREFERS the claimed batch size when it divides the request,
            # so repeated plain run() calls keep working after a reload
            if (self.impl == "blocks"
                    and isinstance(self._pallas_shape, tuple)
                    and self._pallas_shape
                    and self._pallas_shape[0] == "loop"
                    and num_iterations % self._pallas_shape[1] == 0):
                batch = self._pallas_shape[1]
        if batch > 1:
            return self._run_batched(num_iterations, batch, verbose)
        for _ in range(num_iterations):
            with self.timers.phase("step"):
                prev = self.state  # kept so an overflowed frame can be redone
                self.state, stats = self._step_once(prev, self.frame)
                if int(stats.n_listed_dropped) and self._width != 0:
                    # occupancy spiked past the adaptive bucket: REDO this
                    # frame from the saved state at full width, which is
                    # exact by construction — adaptive mode never keeps a
                    # degraded frame
                    self._width = 0
                    self.state, stats = self._step_once(prev, self.frame)
            self.frame += 1
            self.last_stats = stats
            if int(stats.n_tail_alive):
                # active-prefix contract violated (should be impossible:
                # _pick_active reserves full-burst headroom) — fail loudly,
                # physics beyond the prefix was frozen this frame
                raise RuntimeError(
                    f"frame {self.frame}: {int(stats.n_tail_alive)} alive "
                    f"rows beyond active prefix {self._active}")
            if self._active and int(stats.n_spawn_capped):
                # the prefix ran out of free slots while the tail (alive
                # count 0 by the guard above) still had room: children the
                # full-width run would have granted were dropped, so the
                # bit-exactness contract is broken.  The dynamic path
                # re-buckets and cannot normally get here (_pick_active
                # reserves 2 bursts); the FROZEN path (single-Pallas-shape
                # platforms) cannot grow — checkpoint and reload in a fresh
                # process to re-bucket (api.load re-picks the prefix).
                raise RuntimeError(
                    f"frame {self.frame}: active prefix {self._active} "
                    f"saturated — {int(stats.n_spawn_capped)} spawns capped "
                    f"that full width would grant"
                    + ("; checkpoint+reload in a fresh process to re-bucket"
                       if self._frozen_active else ""))
            if self.active_bucketing:
                self._apply_bucketing(int(stats.n_alive))
            if int(stats.n_listed_dropped):
                # full width still truncated (blocks impl: a block's stencil
                # exceeded the static chunk budget C_MAX) — the frame stands
                # but exactness was lost; surface it loudly
                self.n_degraded_frames += 1
                import warnings
                warnings.warn(
                    f"frame {self.frame}: {int(stats.n_listed_dropped)} "
                    f"neighbor entries dropped — forces truncated "
                    f"(impl={self.impl}); raise the chunk budget or cell "
                    f"capacity", RuntimeWarning, stacklevel=2)
            if self.adaptive_width:
                new_w = self._pick_width(int(stats.max_cell_occupancy))
                if new_w != self._width and int(stats.n_listed_dropped) == 0:
                    self._width = new_w
            if verbose:
                print(f"iter {self.frame}: alive={int(stats.n_alive)} "
                      f"spawned={int(stats.n_spawned)} "
                      f"max_cell={int(stats.max_cell_occupancy)} "
                      f"width={self._width or self.cfg.cell_capacity}")
        return self.last_stats

    def profile_frame(self, k1: int = 2, k2: int = 6) -> dict:
        """Stage-by-stage timing of one frame at the CURRENT state — the
        structured equivalent of the reference's per-iteration
        ``total / init_iframe / build_grid / calc_forces`` printout
        (``particleSystem.cpp:1927``); INIT_IFRAME has no cost here (bins
        are rebuilt functionally).  Stages for the production "blocks" impl:

        * ``rng_fields``  — per-frame random field generation
        * ``cell_ids``    — torus wrap + cell id assignment
        * ``build_grid``  — carrying sort + chunk-table build
          (the BUILD_GRID analog, ``particleSystem.cpp:1468-1537``)
        * ``calc_forces`` — the cluster-pair Pallas kernel
          (``particleSystem.cpp:1120-1383`` analog)
        * ``unsort``      — inverse-permutation carrying sort
        * ``lifecycle``   — death/survive/integrate/spawn masked updates
        * ``full_frame``  — the whole fused step for cross-checking

        Each stage is timed in its OWN subprocess as that process's first
        and only jit, dispatched ``k1``/``k2`` times (cost = dispatch-count
        slope with host-readback sync).  Why subprocesses: jax 0.9's
        dispatch-cache misassociation (tools/repro_jax_dispatch_bug.py) is
        process-global — after the Pallas-bearing step has run, any newly
        created jit fails from its SECOND dispatch on, so staged timing
        inside this process is impossible; first calls do work, which is
        how this method computes each stage's inputs to hand over.
        Results are recorded into ``self.timers`` (phases ``frame/<stage>``)
        and returned as {stage: ms}.  Does not advance ``self.state``."""
        import dataclasses as _dc
        import json as _json
        import os
        import subprocess
        import sys
        import tempfile

        from .models import nbody as _nbody
        from .ops import neighbor_blocks as nbk
        from .ops.grid import coords_to_cell, wrap_positions

        cfg = self.cfg
        state, frame = self.state, jnp.int32(self.frame)
        if self._active and self._active < state.slots:
            # production stages run on the active slot prefix
            # (models/nbody.step slices [:active] and concatenates the
            # frozen tail back) — profile the same shapes.  The tail
            # re-concat the production step pays is a contiguous copy of
            # frozen rows, bandwidth-trivial next to any stage here.
            state = jax.tree.map(lambda a: a[:self._active], state)

        def once(f, *args):
            """Single dispatch with the last-line recovery (first calls of
            any jit are reliable; see utils/dispatchbug.py)."""
            def dispatch():
                r = jax.jit(f)(*args)
                jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
                return r
            return recovering_call(dispatch)

        # ---- compute every stage's inputs with single dispatches --------
        arrays = dict(pos=state.pos, vel=state.vel, acc=state.acc,
                      w=state.w, age=state.age, life=state.life,
                      alive=state.alive, parent=state.parent,
                      tag=state.tag, frame=frame)
        uvec, fert = once(lambda fr, t: _nbody.frame_fields(cfg, fr, t),
                          frame, state.tag)
        arrays.update(uvec=uvec, fert=fert)
        cell = once(lambda p: coords_to_cell(
            wrap_positions(p, cfg.grid)[1], cfg.grid), state.pos)
        arrays.update(cell=cell)
        stages = ["rng_fields", "cell_ids", "build_grid", "lifecycle",
                  "full_frame"]
        if self.impl == "blocks":
            snap, chunks, order, ovf_s, *_rest = once(
                lambda p, a2, w2, c2, al, t: nbk.prepare(
                    p, a2, w2, c2, al, cfg, tags=t),
                state.pos, state.age, state.w, cell, state.alive, state.tag)
            n = state.slots
            kout = once(lambda s, c: nbk.kernel_call(cfg, s, c, n),
                        snap, chunks)
            arrays.update(snap=snap, chunks=chunks, order=order,
                          ovf_s=ovf_s, kout=kout)
            stages[3:3] = ["calc_forces", "unsort"]

        # ---- one child process per stage --------------------------------
        cfg_json = _json.dumps(_dc.asdict(cfg))
        out: dict = {}
        with tempfile.TemporaryDirectory() as td:
            npz = os.path.join(td, "stage_inputs.npz")
            np.savez(npz, **{k: np.asarray(v) for k, v in arrays.items()})
            env = dict(os.environ)
            if jax.default_backend() == "cpu":
                # children must follow the parent onto CPU (the container's
                # sitecustomize would otherwise pin them to the TPU plugin)
                env["JAX_PLATFORMS"] = "cpu"
                env["PALLAS_AXON_POOL_IPS"] = ""
            for stage in stages:
                proc = subprocess.run(
                    [sys.executable, "-m",
                     "particlesystem_tpu.utils.profile_stage",
                     "--npz", npz, "--cfg", cfg_json, "--stage", stage,
                     "--width", str(self._width), "--impl", self.impl,
                     "--k1", str(k1), "--k2", str(k2)],
                    capture_output=True, text=True, env=env,
                    cwd=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))))
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"stage {stage} profiling failed:\n{proc.stderr[-2000:]}")
                line = proc.stdout.strip().splitlines()[-1]
                out[stage] = float(_json.loads(line)["ms"])

        for name, ms in out.items():
            self.timers.totals[f"frame/{name}"] += ms / 1e3
            self.timers.counts[f"frame/{name}"] += 1
        return out

    def save(self, path: str) -> None:
        checkpoint.save(path, self.state,
                        meta=dict(frame=self.frame,
                                  **checkpoint.config_fingerprint(self.cfg)))

    def load(self, path: str) -> None:
        self.state, meta = checkpoint.load(path, self.state,
                                           expect_config=self.cfg)
        self.frame = int(meta.get("frame", 0))
        if not self._frozen_active:
            self._active = 0  # loaded layout unknown; run() re-buckets
            return
        # Single-Pallas-shape platform: compact (sort-only program, safe),
        # then keep the frozen prefix if the loaded population fits it —
        # changing the step shape mid-process would wedge the client
        # (utils/dispatchbug.py).  Before any step has been dispatched the
        # shape is still free to choose.
        if self._compact_jit is None:
            self._compact_jit = jax.jit(nbody.compact_state)
        self.state = recovering_call(self._compact_jit, self.state)
        import numpy as _np
        alive = int(_np.asarray(self.state.alive).sum())
        want = self._pick_active(alive)
        if not self._stepped:
            self._active = want
        elif (want or self.cfg.slots) > (self._active or self.cfg.slots):
            raise RuntimeError(
                f"loaded population ({alive} alive) exceeds the frozen "
                f"active prefix {self._active}; load the checkpoint in a "
                f"fresh process (single-Pallas-shape platform, see "
                f"utils/dispatchbug.py)")

    def validate(self, frames: int = 5) -> dict:
        """Run ``frames`` steps of both the device path and the independent
        numpy oracle from the CURRENT state and report the deviation — the
        working version of the reference's serial-vs-parallel comparison,
        which is stubbed to always pass (``DoCompare``,
        ``particleSystem.cpp:2254-2257``).  Discrete lifecycle events must
        match exactly; float trajectories to accumulation-order tolerance.
        Does not advance ``self.state``."""
        import numpy as np

        from .cpu_ref import oracle_nbody
        from .cpu_ref.oracle_emitter import NpState

        dev = self.state
        ora = NpState.from_jax(dev)
        worst = 0.0
        events_match = True
        # Device side runs the PRODUCTION impl through the instance
        # wrapper jits (see _step_fn — the raw module jit is never
        # dispatched); the oracle gets the same per-frame random fields
        # recomputed separately — deterministic threefry keyed on
        # (seed, frame, tag), so both sides see identical draws.
        fields_fn = jax.jit(lambda f, t: nbody.frame_fields(self.cfg, f, t))
        saved_width = self._width
        self._width = 0  # validation always runs exact full width
        try:
            for f in range(self.frame, self.frame + frames):
                uvec, fert = fields_fn(jnp.int32(f), dev.tag)
                dev, stats = self._step_once(dev, f)
                ora, ostats = oracle_nbody.step(ora, np.asarray(uvec),
                                                np.asarray(fert), f,
                                                self.cfg)
                for k, v in ostats.items():
                    if int(getattr(stats, k)) != v:
                        events_match = False
                if not np.array_equal(np.asarray(dev.alive), ora.alive):
                    events_match = False
                m = np.asarray(dev.alive)
                if m.any():
                    worst = max(worst, float(np.abs(
                        np.asarray(dev.pos)[m] - ora.pos[m]).max()))
        finally:
            self._width = saved_width
        return {"events_match": events_match,
                "max_position_deviation": worst, "frames": frames}
