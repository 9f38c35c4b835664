"""CFR and Fictitious-Play subgame solvers as pure JAX programs.

TPU-first re-design of the reference solvers
(/root/reference/csrc/liars_dice/subgame_solving.cc:305-715).  The
reference runs 1024 sequential scalar C++ iterations per subgame across
~60 threads with a GPU round trip per iteration for leaf values; here one
iteration is a fixed dataflow graph over ``[num_nodes, num_hands,
num_actions]`` tensors with the value net fused in, `lax.scan`-able over
iterations and `vmap`-able over thousands of subgames in lockstep.

State is explicit (NamedTuples), solvers are stateless factories of pure
``init``/``step`` functions; thin OO wrappers at the bottom mirror the
reference's ``ISubgameSolver`` interface for host-side (eval) use.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rebel_tpu.solving.core import (
    cfr_discounts,
    RootCtx,
    SolverContext,
    ValueFn,
    normalize,
    regret_eps,
)
from rebel_tpu.solving.params import SubgameSolvingParams


class CFRState(NamedTuple):
    """Indexed ``[node, hand, action]`` like the reference ``TreeStrategy``
    (subgame_solving.h:39); plus per-player step counters and root-value
    running means (subgame_solving.cc:700-714)."""

    regrets: jnp.ndarray  # [N, H, A]
    sum_strategies: jnp.ndarray  # [N, H, A]
    last_strategies: jnp.ndarray  # [N, H, A]
    root_values_means: jnp.ndarray  # [2, H]
    num_steps: jnp.ndarray  # [2] i32
    beliefs: jnp.ndarray  # [2, H]

    # NOTE: unlike the reference (subgame_solving.cc:658-659), the average
    # strategy is NOT materialized each iteration: it always equals
    # normalize(sum_strategies) over the action mask (rows change only when
    # their actor is the traverser, and normalize is idempotent on the
    # stale rows), so it is computed once on demand.  This removes a full
    # [N, H, A] read+write+normalize from the iteration loop.


class FPState(NamedTuple):
    sum_strategies: jnp.ndarray  # [N, H, A]
    last_strategies: jnp.ndarray  # [N, H, A]
    average_strategies: jnp.ndarray  # [N, H, A]
    root_values_means: jnp.ndarray  # [2, H]
    num_strategies: jnp.ndarray  # i32 scalar
    beliefs: jnp.ndarray  # [2, H]


def _uniform_reach_weighted(
    ctx: SolverContext, uniform: jnp.ndarray, beliefs: jnp.ndarray,
    root: RootCtx, amask: jnp.ndarray,
) -> jnp.ndarray:
    """Initial ``sum_strategies``: the uniform strategy with each node's
    rows scaled by its actor's reach under uniform play
    (get_uniform_reach_weigted_strategy, subgame_solving.cc:125-149)."""
    t = ctx.tree
    sum_strat = uniform
    for p in (0, 1):
        reach = ctx.compute_reaches(uniform, beliefs[p], p, root)
        actor = ctx.node_player(t.depth, root) == p
        interior = jnp.asarray(t.num_children > 0)
        row = (actor & interior)[:, None, None]
        sum_strat = jnp.where(row, uniform * reach[:, :, None], sum_strat)
    return sum_strat


# =============================================================== CFR =====
class CFR:
    """Counterfactual-regret-minimization solver
    (subgame_solving.cc:508-715), with regret matching, linear/DCFR
    discounting, and reach-weighted average-strategy accumulation."""

    def __init__(
        self,
        ctx: SolverContext,
        params: SubgameSolvingParams,
        value_fn: ValueFn | None = None,
    ):
        assert params.use_cfr
        self.ctx, self.params, self.value_fn = ctx, params, value_fn

    def init(self, root: RootCtx, beliefs: jnp.ndarray) -> CFRState:
        ctx = self.ctx
        amask = ctx.action_masks(root)
        uniform = ctx.uniform_strategy(amask)
        dt = ctx.dtype
        return CFRState(
            regrets=jnp.zeros((ctx.N, ctx.H, ctx.A), dt),
            sum_strategies=_uniform_reach_weighted(
                ctx, uniform, beliefs.astype(dt), root, amask
            ),
            last_strategies=uniform,
            root_values_means=jnp.zeros((2, ctx.H), dt),
            num_steps=jnp.zeros((2,), jnp.int32),
            beliefs=beliefs.astype(dt),
        )

    def step(self, state: CFRState, traverser, root: RootCtx) -> CFRState:
        """One CFR iteration for ``traverser`` (subgame_solving.cc:577-664)."""
        ctx, p = self.ctx, self.params
        t = ctx.tree
        dt = ctx.dtype
        traverser = jnp.asarray(traverser, jnp.int32)
        amask = ctx.action_masks(root)

        # --- update_regrets (subgame_solving.cc:538-575)
        reach0 = ctx.compute_reaches(state.last_strategies, state.beliefs[0], 0, root)
        reach1 = ctx.compute_reaches(state.last_strategies, state.beliefs[1], 1, root)
        leaf_vals = ctx.all_leaf_values(reach0, reach1, traverser, root, self.value_fn)
        values, q_minus_v = ctx.backup_expected(
            leaf_vals, state.last_strategies, traverser, root, amask,
            with_regrets=True,
        )
        regrets = state.regrets + q_minus_v

        # --- root value running mean (subgame_solving.cc:579-590)
        n = state.num_steps[traverser].astype(dt)
        alpha = 2.0 / (n + 2.0) if p.linear_update else 1.0 / (n + 1.0)
        rvm = state.root_values_means
        rvm = rvm.at[traverser].add((values[0] - rvm[traverser]) * alpha)

        # --- discounts (subgame_solving.cc:592-617)
        num_strategies = n + 1.0  # uniform counts as one strategy
        pos_d, neg_d, strat_d = cfr_discounts(p, num_strategies, dt)

        # --- regret matching (subgame_solving.cc:619-634)
        actor_row = (
            (ctx.node_player(t.depth, root) == traverser)
            & jnp.asarray(t.num_children > 0)
        )[:, None, None]
        floored = jnp.maximum(regrets, regret_eps(dt))
        matched = normalize(floored, amask[:, None, :])
        last = jnp.where(actor_row, matched, state.last_strategies)

        # --- average accumulation (subgame_solving.cc:636-661)
        reach_last = ctx.compute_reaches(
            last, state.beliefs[traverser], traverser, root
        )
        regrets = jnp.where(
            actor_row,
            regrets * jnp.where(regrets > 0, pos_d, neg_d),
            regrets,
        )
        sum_strat = jnp.where(
            actor_row,
            state.sum_strategies * strat_d + reach_last[:, :, None] * last,
            state.sum_strategies,
        )

        return CFRState(
            regrets=regrets,
            sum_strategies=sum_strat,
            last_strategies=last,
            root_values_means=rvm,
            num_steps=state.num_steps.at[traverser].add(1),
            beliefs=state.beliefs,
        )

    def multistep(self, state: CFRState, root: RootCtx) -> CFRState:
        """``num_iters`` alternating-traverser steps
        (subgame_solving.cc:666-670) under ``lax.scan``."""

        def body(carry, it):
            return self.step(carry, it % 2, root), None

        state, _ = jax.lax.scan(
            body, state, jnp.arange(self.params.num_iters)
        )
        return state

    # Sampling / belief-propagation strategy is the current iterate
    # (subgame_solving.cc:682-688).
    @staticmethod
    def sampling_strategy(state: CFRState) -> jnp.ndarray:
        return state.last_strategies

    def average_strategy(self, state: CFRState, root: RootCtx) -> jnp.ndarray:
        return normalize(
            state.sum_strategies, self.ctx.action_masks(root)[:, None, :]
        )


# ================================================================ FP =====
class FP:
    """Fictitious play against the average strategy via full best response
    (subgame_solving.cc:364-506)."""

    def __init__(
        self,
        ctx: SolverContext,
        params: SubgameSolvingParams,
        value_fn: ValueFn | None = None,
    ):
        assert not params.use_cfr
        self.ctx, self.params, self.value_fn = ctx, params, value_fn

    def init(self, root: RootCtx, beliefs: jnp.ndarray) -> FPState:
        ctx = self.ctx
        amask = ctx.action_masks(root)
        uniform = ctx.uniform_strategy(amask)
        return FPState(
            sum_strategies=_uniform_reach_weighted(
                ctx, uniform, beliefs.astype(ctx.dtype), root, amask
            ),
            last_strategies=uniform,
            average_strategies=uniform,
            root_values_means=jnp.zeros((2, ctx.H), ctx.dtype),
            num_strategies=jnp.int32(0),
            beliefs=beliefs.astype(ctx.dtype),
        )

    def compute_br(self, state: FPState, traverser, root: RootCtx):
        """Best response vs the average strategy (BRSolver::compute_br,
        subgame_solving.cc:316-358): reaches and leaf values under the
        *opponent's* (average) strategy, then a max/sum backup."""
        ctx = self.ctx
        amask = ctx.action_masks(root)
        avg = state.average_strategies
        reach0 = ctx.compute_reaches(avg, state.beliefs[0], 0, root)
        reach1 = ctx.compute_reaches(avg, state.beliefs[1], 1, root)
        leaf_vals = ctx.all_leaf_values(
            reach0, reach1, traverser, root, self.value_fn
        )
        values, br = ctx.backup_best_response(leaf_vals, traverser, root, amask)
        return values, br

    def step(self, state: FPState, traverser, root: RootCtx) -> FPState:
        """One FP iteration (FP::step, subgame_solving.cc:421-463)."""
        ctx, p = self.ctx, self.params
        t = ctx.tree
        dt = ctx.dtype
        traverser = jnp.asarray(traverser, jnp.int32)
        amask = ctx.action_masks(root)

        values, br = self.compute_br(state, traverser, root)

        # Root-value running mean with alternating-update count
        # (subgame_solving.cc:427-438).
        num_update = (state.num_strategies // 2 + 1).astype(dt)
        alpha = (
            2.0 / (num_update + 1.0) if p.linear_update else 1.0 / num_update
        )
        rvm = state.root_values_means
        rvm = rvm.at[traverser].add((values[0] - rvm[traverser]) * alpha)

        # update_sum_strat (subgame_solving.cc:390-419): the recursive
        # belief-carrying descent is exactly a reach computation under the
        # BR strategy for the traverser.
        reach_br = ctx.compute_reaches(
            br, state.beliefs[traverser], traverser, root
        )
        actor_row = (
            (ctx.node_player(t.depth, root) == traverser)
            & jnp.asarray(t.num_children > 0)
        )[:, None, None]
        weighted_br = reach_br[:, :, None] * br
        sum_strat = jnp.where(
            actor_row, state.sum_strategies + weighted_br, state.sum_strategies
        )
        last = jnp.where(actor_row, weighted_br, state.last_strategies)

        # Linear decay after accumulation (subgame_solving.cc:447-450).
        if p.linear_update:
            decay = (num_update + 1.0) / (num_update + 2.0)
            sum_strat = jnp.where(actor_row, sum_strat * decay, sum_strat)

        # Average = normalized sum; optimistic adds the last BR once more
        # (subgame_solving.cc:452-459).
        numer = sum_strat + last if p.optimistic else sum_strat
        avg = jnp.where(
            actor_row,
            normalize(numer, amask[:, None, :]),
            state.average_strategies,
        )

        return FPState(
            sum_strategies=sum_strat,
            last_strategies=last,
            average_strategies=avg,
            root_values_means=rvm,
            num_strategies=state.num_strategies + 1,
            beliefs=state.beliefs,
        )

    def multistep(self, state: FPState, root: RootCtx) -> FPState:
        def body(carry, it):
            return self.step(carry, it % 2, root), None

        state, _ = jax.lax.scan(
            body, state, jnp.arange(self.params.num_iters)
        )
        return state

    # FP samples and propagates beliefs with the average strategy
    # (subgame_solving.h:76-83 defaults).
    @staticmethod
    def sampling_strategy(state: FPState) -> jnp.ndarray:
        return state.average_strategies

    def average_strategy(self, state: FPState, root: RootCtx) -> jnp.ndarray:
        del root
        return state.average_strategies


def build_solver(
    ctx: SolverContext,
    params: SubgameSolvingParams,
    value_fn: ValueFn | None = None,
):
    """Factory mirroring ``build_solver`` (subgame_solving.cc:791-800)."""
    cls = CFR if params.use_cfr else FP
    return cls(ctx, params, value_fn)


# ==================================================== host wrapper =======
class SubgameSolver:
    """Stateful convenience wrapper mirroring ``ISubgameSolver``
    (subgame_solving.h:60-88) for host-side/eval use.  Compiled once per
    (ctx, params); repeated calls reuse the jitted step."""

    def __init__(
        self,
        ctx: SolverContext,
        params: SubgameSolvingParams,
        root: RootCtx,
        beliefs,
        value_fn: ValueFn | None = None,
    ):
        self.impl = build_solver(ctx, params, value_fn)
        self.ctx = ctx
        self.params = params
        self.root = root
        self.state = self.impl.init(root, jnp.asarray(beliefs))
        self._step = jax.jit(self.impl.step)
        self._multi = jax.jit(self.impl.multistep)

    def step(self, traverser: int) -> None:
        self.state = self._step(self.state, traverser, self.root)

    def multistep(self) -> None:
        self.state = self._multi(self.state, self.root)

    def get_strategy(self):
        return self.impl.average_strategy(self.state, self.root)

    def get_sampling_strategy(self):
        return self.impl.sampling_strategy(self.state)

    def get_belief_propagation_strategy(self):
        return self.impl.sampling_strategy(self.state)

    def get_hand_values(self, player_id: int):
        return self.state.root_values_means[player_id]

    @property
    def tree(self):
        return self.ctx.tree
