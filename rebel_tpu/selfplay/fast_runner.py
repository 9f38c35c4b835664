"""Fast self-play engines for the production depth-2 configuration.

Same semantics as :class:`rebel_tpu.selfplay.runner.SelfPlayEngine` (the
lockstep batched ``RlRunner``) but built on the gather-free action-grid
solvers.  Three engines share one solve→walk structure and one episode
walk implementation (:func:`walk_lane`):

* ``FastSelfPlayEngine`` — vmapped batch-first grid2 solve;
* ``FastBatchedEngine``  — batch-last (lane-dim) grid2b solve;
* ``FastPallasEngine``   — the whole solve fused into one Pallas kernel.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.solving.core import (
    RootCtx,
    ValueFn,
    normalize_safe,
    reach_eps,
    root_query as core_root_query,
)
from rebel_tpu.solving.grid2 import Grid2Solver
from rebel_tpu.selfplay.runner import (
    EpisodeState,
    StepOutput,
    RecursiveSolvingParams,
)


def root_query(game: LiarsDice, dtype, beliefs, traverser, root: RootCtx):
    """The value-net query for the episode's root PBS — delegates to
    the single shared builder (core.root_query)."""
    return core_root_query(
        game, dtype, beliefs, traverser, root.bid, root.player
    )


def sample_action(cfg: RecursiveSolvingParams, key, policy_row, mask,
                  bel_actor, explore_ok):
    """One reference-style action draw: with prob random_action_prob (for
    the BR-sampled player) uniform over legal actions, else hand ~
    beliefs then action ~ policy[hand] (recursive_solving.cc:202-216)."""
    k_eps, k_uni, k_hand, k_act = jax.random.split(key, 4)
    explore = explore_ok & (
        jax.random.uniform(k_eps) < cfg.random_action_prob
    )
    a_uniform = jax.random.categorical(
        k_uni, jnp.where(mask, 0.0, -jnp.inf)
    )
    hand = jax.random.categorical(k_hand, jnp.log(bel_actor))
    a_policy = jax.random.categorical(k_act, jnp.log(policy_row[hand]))
    return jnp.where(explore, a_uniform, a_policy).astype(jnp.int32)


def walk_lane(cfg: RecursiveSolvingParams, dtype, ep: EpisodeState,
              key: jax.Array, p0_l, p1_l, vals):
    """One lane's episode advance given its solved subgame policies.

    The depth-2 walk unrolls to exactly two sampling steps with Bayes
    belief updates (recursive_solving.cc:192-246); ``key`` is consumed
    with the same split pattern as the solve side (slot 0 is the solve
    key), so all engines draw identical actions for identical policies.
    Shared by every fast engine — the single implementation of the
    sample-walk block.
    """
    game = cfg.game
    _, k_br, k_a1, k_a2 = jax.random.split(key, 4)
    root_l = RootCtx.of(game, ep.root_bid, ep.root_player)
    queries = jnp.stack(
        [
            root_query(game, dtype, ep.beliefs, jnp.int32(0), root_l),
            root_query(game, dtype, ep.beliefs, jnp.int32(1), root_l),
        ]
    )
    liar = game.liar_call
    eps_reach = reach_eps(dtype)
    br_sampler = jax.random.randint(k_br, (), 0, 2)
    beliefs = ep.beliefs

    # --- step 1: root actor acts.
    actor0 = root_l.player
    a1 = sample_action(
        cfg, k_a1, p0_l, root_l.mask, beliefs[actor0], actor0 == br_sampler
    )
    new_row = normalize_safe(beliefs[actor0] * p0_l[:, a1], eps_reach)
    beliefs = beliefs.at[actor0].set(new_row)
    done1 = a1 == liar

    if cfg.sample_leaf:
        # --- step 2: level-1 actor acts (unless liar ended it).
        actor1 = (root_l.player + 1) % 2
        m1_row = (jnp.arange(game.num_actions) > a1) & (a1 != liar)
        a2 = sample_action(
            cfg, k_a2, p1_l[a1], m1_row, beliefs[actor1],
            actor1 == br_sampler,
        )
        row2 = normalize_safe(beliefs[actor1] * p1_l[a1, :, a2], eps_reach)
        beliefs = jnp.where(done1, beliefs, beliefs.at[actor1].set(row2))
        new_bid = jnp.where(done1, a1, a2).astype(jnp.int32)
        new_player = jnp.where(done1, actor1, root_l.player).astype(
            jnp.int32
        )
        ended = done1 | (a2 == liar)
    else:
        new_bid = a1
        new_player = (1 - root_l.player).astype(jnp.int32)
        ended = done1

    fresh = EpisodeState.initial(game, dtype)
    new_ep = EpisodeState(
        root_bid=jnp.where(ended, fresh.root_bid, new_bid),
        root_player=jnp.where(ended, fresh.root_player, new_player),
        beliefs=jnp.where(ended, fresh.beliefs, beliefs),
    )
    return new_ep, StepOutput(queries=queries, values=vals, ended=ended)


@dataclasses.dataclass(frozen=True, eq=False)
class FastSelfPlayEngine:
    """Drop-in replacement for SelfPlayEngine when
    ``subgame_params.max_depth == 2`` (the trained configuration,
    conf/c02_selfplay/liars_sp.yaml:14)."""

    cfg: RecursiveSolvingParams
    dtype: jnp.dtype = jnp.float32
    # Mesh axis name to shard the solver's hands dimension over (SURVEY
    # §5's sequence-parallelism analog).  The 1024-iteration solve runs
    # fully sharded (per-iteration cross-shard traffic = the psum of
    # D+1 win-probability buckets inside Grid2Solver); the solved
    # policies/values are all-gathered ONCE per subgame so the cheap
    # episode walk and the replay examples stay full-H.
    hands_axis: str | None = None

    def __post_init__(self):
        assert self.cfg.subgame_params.max_depth == 2
        object.__setattr__(self, "game", self.cfg.game)

    def _solver(self, value_fn: ValueFn | None) -> Grid2Solver:
        return Grid2Solver(
            game=self.game,
            params=self.cfg.subgame_params,
            dtype=self.dtype,
            value_fn=value_fn,
            hands_axis=self.hands_axis,
        )

    def _solve_with_snapshot(self, root, beliefs, key, value_fn):
        params = self.cfg.subgame_params
        solver = self._solver(value_fn)
        state0 = solver.init(root, beliefs)
        t = jax.random.randint(key, (), 0, params.num_iters + 1)
        snap0 = solver.sampling_strategy(state0, root)

        def body(carry, it):
            state, snap = carry
            cur = solver.sampling_strategy(state, root)
            snap = jax.tree.map(
                lambda c, s: jnp.where(it == t, c, s), cur, snap
            )
            state = solver.step(state, it % 2, root)
            return (state, snap), None

        (state, snap), _ = jax.lax.scan(
            body, (state0, snap0), jnp.arange(params.num_iters)
        )
        final = solver.sampling_strategy(state, root)
        snap = jax.tree.map(
            lambda c, s: jnp.where(t == params.num_iters, c, s), final, snap
        )
        return state, snap

    def step(
        self, ep: EpisodeState, key: jax.Array, value_fn: ValueFn | None
    ) -> tuple[EpisodeState, StepOutput]:
        k_solve = jax.random.split(key, 4)[0]
        root = RootCtx.of(self.game, ep.root_bid, ep.root_player)
        beliefs = ep.beliefs
        if self.hands_axis:
            # Episode state keeps full-H beliefs (replicated over the
            # hands axis); the solve runs on this shard's hand slice.
            from rebel_tpu.solving.grid2 import local_hands

            beliefs = local_hands(self.hands_axis, beliefs)
        state, (p0, p1) = self._solve_with_snapshot(
            root, beliefs, k_solve, value_fn
        )
        vals = state.root_values_means
        if self.hands_axis:
            # One gather per *subgame* (not per iteration): policies for
            # the walk, per-hand root CFVs for the training example.
            ax = self.hands_axis
            p0 = jax.lax.all_gather(p0, ax, axis=0, tiled=True)
            p1 = jax.lax.all_gather(p1, ax, axis=1, tiled=True)
            vals = jax.lax.all_gather(vals, ax, axis=-1, tiled=True)
        return walk_lane(
            self.cfg, self.dtype, ep, key, p0, p1, vals
        )

    def batch_step(self, eps: EpisodeState, keys: jax.Array, value_fn):
        return jax.vmap(lambda e, k: self.step(e, k, value_fn))(eps, keys)


def make_engine(
    cfg: RecursiveSolvingParams,
    dtype=jnp.float32,
    kind: str = "auto",
    net_compute_dtype=jnp.float32,
):
    """Engine factory.

    kind: 'auto' (grid fast path when depth == 2, generic otherwise),
    'generic', 'fast' (vmapped grid2), 'batched' (batch-last grid2b),
    'pallas' (fused TPU kernel).
    """
    from rebel_tpu.selfplay.runner import SelfPlayEngine

    depth2 = cfg.subgame_params.max_depth == 2
    if kind == "auto":
        kind = "fast" if depth2 else "generic"
    if kind != "generic" and not depth2:
        raise ValueError(f"engine kind {kind!r} requires max_depth == 2")
    if kind == "generic":
        return SelfPlayEngine(cfg=cfg, dtype=dtype)
    if kind == "fast":
        return FastSelfPlayEngine(cfg=cfg, dtype=dtype)
    if kind == "batched":
        return FastBatchedEngine(
            cfg=cfg, dtype=dtype, net_compute_dtype=net_compute_dtype
        )
    if kind == "pallas":
        return FastPallasEngine(
            cfg=cfg, dtype=dtype, net_compute_dtype=net_compute_dtype
        )
    raise ValueError(f"unknown engine kind {kind!r}")


@dataclasses.dataclass(frozen=True, eq=False)
class FastBatchedEngine:
    """Batch-last engine: the 1024-iteration solve runs with the subgame
    batch in the tensor minor (lane) dimension
    (:class:`rebel_tpu.solving.grid2b.Grid2BatchSolver`); only the cheap
    once-per-solve walk is vmapped batch-first.  Takes the value net's
    *param tree* (not a closure) so the MLP can run transposed."""

    cfg: RecursiveSolvingParams
    dtype: jnp.dtype = jnp.float32
    net_compute_dtype: jnp.dtype = jnp.float32

    wants_params = True  # engine API: batch_step takes net params

    def __post_init__(self):
        assert self.cfg.subgame_params.max_depth == 2
        object.__setattr__(self, "game", self.cfg.game)

    def batch_step(self, eps: EpisodeState, keys: jax.Array, net_params):
        from rebel_tpu.solving.grid2b import Grid2BatchSolver, RootCtxB

        game = self.game
        sub = self.cfg.subgame_params
        solver = Grid2BatchSolver(
            game=game,
            params=sub,
            dtype=self.dtype,
            net_params=net_params,
            net_compute_dtype=self.net_compute_dtype,
        )
        root = RootCtxB.of(game, eps.root_bid, eps.root_player)
        beliefs_bl = jnp.moveaxis(eps.beliefs, 0, -1)  # [2, H, B]

        k_solve = jax.vmap(lambda k: jax.random.split(k, 4)[0])(keys)
        t = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, sub.num_iters + 1)
        )(k_solve)

        state = solver.init(root, beliefs_bl)
        snap0 = solver.sampling_strategy(state, root)

        def body(carry, it):
            st, snap = carry
            cur = solver.sampling_strategy(st, root)
            snap = jax.tree.map(
                lambda c, s: jnp.where(it == t, c, s), cur, snap
            )
            st = solver.step(st, it % 2, root)
            return (st, snap), None

        (state, (s0, s1)), _ = jax.lax.scan(
            body, (state, snap0), jnp.arange(sub.num_iters)
        )
        f0, f1 = solver.sampling_strategy(state, root)
        s0 = jnp.where(t == sub.num_iters, f0, s0)
        s1 = jnp.where(t == sub.num_iters, f1, s1)

        # Back to batch-first for the walk + outputs.
        p0 = jnp.moveaxis(s0, -1, 0)  # [B, H, A]
        p1 = jnp.moveaxis(s1, -1, 0)  # [B, A, H, A]
        values = jnp.moveaxis(state.root_values_means, -1, 0)  # [B, 2, H]

        return jax.vmap(
            lambda e, k, q0, q1, v: walk_lane(
                self.cfg, self.dtype, e, k, q0, q1, v
            )
        )(eps, keys, p0, p1, values)


@dataclasses.dataclass(frozen=True, eq=False)
class FastPallasEngine:
    """Self-play engine whose whole subgame solve (state + terminal
    operator + CFV MLP, all ``num_iters`` iterations) runs inside one
    Pallas TPU kernel per block of lanes
    (:class:`rebel_tpu.solving.grid2p.Grid2PallasSolver`)."""

    cfg: RecursiveSolvingParams
    dtype: jnp.dtype = jnp.float32
    lane_block: int = 128
    net_compute_dtype: jnp.dtype = jnp.float32
    mlp_chunks: int = 1
    gelu: str = "auto"
    ablate: str = ""
    interleave: int = 1
    interpret: bool = False

    wants_params = True

    def __post_init__(self):
        assert self.cfg.subgame_params.max_depth == 2
        object.__setattr__(self, "game", self.cfg.game)

    def batch_step(self, eps: EpisodeState, keys: jax.Array, net_params):
        from rebel_tpu.solving.grid2p import Grid2PallasSolver

        sub = self.cfg.subgame_params
        B = keys.shape[0]
        solver = Grid2PallasSolver(
            game=self.game,
            params=sub,
            # Largest block that divides B (solve requires B % LB == 0);
            # min() alone breaks on e.g. B=192 with lane_block=128.
            lane_block=math.gcd(self.lane_block, B),
            net_compute_dtype=self.net_compute_dtype,
            mlp_chunks=self.mlp_chunks,
            gelu=self.gelu,
            ablate=self.ablate,
            interleave=self.interleave,
            interpret=self.interpret,
        )
        k_solve = jax.vmap(lambda k: jax.random.split(k, 4)[0])(keys)
        t = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, sub.num_iters + 1)
        )(k_solve)
        out = solver.solve(
            eps.root_bid, eps.root_player, eps.beliefs, t, net_params
        )
        return jax.vmap(
            lambda e, k, q0, q1, v: walk_lane(
                self.cfg, self.dtype, e, k, q0, q1, v
            )
        )(eps, keys, out.snap0, out.snap1, out.rvm)
