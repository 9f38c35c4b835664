"""Batched self-play episode engine.

TPU-first re-design of ``RlRunner``
(/root/reference/csrc/liars_dice/recursive_solving.cc:160-275).  The
reference runs one episode per OS thread, each step building a fresh C++
subgame solver, running ``t ~ U[0, num_iters]`` iterations, sampling the
next state from the iteration-``t`` policy, finishing the remaining
iterations, and emitting the root counterfactual values as a training
example.

Here the unit of work is one *engine step* over ``B`` lanes in lockstep
under a single jit'd program:

1. every lane solves the depth-limited subgame rooted at its current
   public state on the shared masked supertree (one static topology for
   all roots — see :mod:`rebel_tpu.tree`), running the full ``num_iters``
   via ``lax.scan`` with the value net fused in;
2. the sampling policy *at each lane's own random stop iteration* ``t`` is
   captured with a masked snapshot inside the scan (the reference pays the
   full ``num_iters`` per subgame anyway, recursive_solving.cc:168-177, so
   lockstep costs no extra solver work);
3. each lane walks its snapshot policy to a subgame leaf with
   epsilon-exploration by a randomly chosen best-response player, applying
   Bayes belief updates ``b'(h) \\propto b(h) pi(a|h)`` along the path
   (recursive_solving.cc:192-246);
4. two training examples (traverser 0/1: root query + running-mean root
   values) are emitted per lane per step (subgame_solving.cc:471-474);
5. lanes landing on terminal states reset to the initial state, giving
   continuous episodes.

Note: the reference walks the path twice — once with the sampling
strategy, once with the belief-propagation strategy
(recursive_solving.cc:232-245).  For both CFR (last iterate) and FP
(average) the two strategies are the same object
(subgame_solving.cc:682-688, subgame_solving.h:76-83), so a single pass
is exact.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import INITIAL_ACTION, LiarsDice
from rebel_tpu.solving.core import RootCtx, SolverContext, ValueFn, normalize_safe, reach_eps
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.solver import CFR, FP, build_solver
from rebel_tpu.tree import build_supertree


@dataclasses.dataclass(frozen=True)
class RecursiveSolvingParams:
    """Mirrors the reference struct (recursive_solving.h:31-38)."""

    num_dice: int = 1
    num_faces: int = 4
    subgame_params: SubgameSolvingParams = SubgameSolvingParams()
    random_action_prob: float = 1.0
    sample_leaf: bool = False

    @property
    def game(self) -> LiarsDice:
        return LiarsDice(self.num_dice, self.num_faces)


class EpisodeState(NamedTuple):
    """Per-lane public state + beliefs (RlRunner state_, beliefs_,
    recursive_solving.h:77-83)."""

    root_bid: jnp.ndarray  # i32 scalar, -1 = initial state
    root_player: jnp.ndarray  # i32 scalar
    beliefs: jnp.ndarray  # [2, H]

    @staticmethod
    def initial(game: LiarsDice, dtype=jnp.float32) -> "EpisodeState":
        return EpisodeState(
            root_bid=jnp.int32(INITIAL_ACTION),
            root_player=jnp.int32(0),
            beliefs=jnp.full((2, game.num_hands), 1.0 / game.num_hands, dtype),
        )

    @staticmethod
    def initial_batch(game: LiarsDice, batch: int, dtype=jnp.float32):
        one = EpisodeState.initial(game, dtype)
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one
        )


class StepOutput(NamedTuple):
    queries: jnp.ndarray  # [2, Q] training-example queries (traverser 0, 1)
    values: jnp.ndarray  # [2, H] root counterfactual values
    ended: jnp.ndarray  # bool: episode terminated this step


@dataclasses.dataclass(frozen=True, eq=False)
class SelfPlayEngine:
    """Factory of the jit-able engine step.  Build once per
    (game, params, value-net architecture); the value net's *parameters*
    flow through the step call so weight sync with the learner is free."""

    cfg: RecursiveSolvingParams
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        game = self.cfg.game
        tree = build_supertree(game, self.cfg.subgame_params.max_depth)
        ctx = SolverContext(game=game, tree=tree, dtype=self.dtype)
        object.__setattr__(self, "game", game)
        object.__setattr__(self, "ctx", ctx)

    # ------------------------------------------------------------- solve
    def _solve_with_snapshot(
        self, root: RootCtx, beliefs: jnp.ndarray, key: jax.Array,
        value_fn: ValueFn | None,
    ):
        """Full ``num_iters`` solve; returns (final_state, policy snapshot
        at ``t ~ U[0, num_iters]``) — the policy the reference would sample
        from after ``t`` sequential steps (recursive_solving.cc:168-174)."""
        params = self.cfg.subgame_params
        solver = build_solver(self.ctx, params, value_fn)
        state0 = solver.init(root, beliefs)
        t = jax.random.randint(key, (), 0, params.num_iters + 1)
        snap0 = solver.sampling_strategy(state0)

        def body(carry, it):
            state, snap = carry
            snap = jnp.where(it == t, solver.sampling_strategy(state), snap)
            state = solver.step(state, it % 2, root)
            return (state, snap), None

        (state, snap), _ = jax.lax.scan(
            body, (state0, snap0), jnp.arange(params.num_iters)
        )
        snap = jnp.where(
            t == params.num_iters, solver.sampling_strategy(state), snap
        )
        return state, snap

    # -------------------------------------------------------------- walk
    def _walk_to_leaf(
        self, root: RootCtx, beliefs: jnp.ndarray, policy: jnp.ndarray,
        key: jax.Array,
    ):
        """Sample a path root->leaf with epsilon-exploration and Bayes
        belief updates (sample_state_to_leaf, recursive_solving.cc:192-246).
        Returns (leaf node id, updated beliefs [2, H])."""
        ctx, game = self.ctx, self.game
        t = ctx.tree
        rap = self.cfg.random_action_prob
        eps_reach = reach_eps(self.dtype)

        key, k_br = jax.random.split(key)
        br_sampler = jax.random.randint(k_br, (), 0, 2)
        amask = ctx.action_masks(root)

        depth_np = jnp.asarray(t.depth)
        child_np = jnp.asarray(np.maximum(t.child_index, 0))
        is_leaf_np = jnp.asarray(t.is_leaf | t.is_terminal)

        def body(carry, k):
            node, bel, done = carry
            k_eps, k_uni, k_hand, k_act = jax.random.split(k, 4)
            player = ctx.node_player(depth_np[node], root)
            node_mask = amask[node]  # [A]
            # Exploration branch: uniform among legal actions
            # (recursive_solving.cc:206-208).
            explore = (
                (player == br_sampler)
                & (jax.random.uniform(k_eps) < rap)
            )
            a_uniform = jax.random.categorical(
                k_uni, jnp.where(node_mask, 0.0, -jnp.inf)
            )
            # On-policy branch: hand ~ beliefs, action ~ policy[node, hand]
            # (recursive_solving.cc:210-216).
            hand = jax.random.categorical(k_hand, jnp.log(bel[player]))
            a_policy = jax.random.categorical(
                k_act, jnp.log(policy[node, hand, :])
            )
            action = jnp.where(explore, a_uniform, a_policy)
            # Bayes update for the actor's beliefs
            # (recursive_solving.cc:220-226).
            new_row = normalize_safe(
                bel[player] * policy[node, :, action], eps_reach
            )
            bel = jnp.where(done, bel, bel.at[player].set(new_row))
            node = jnp.where(done, node, child_np[node, action])
            done = done | is_leaf_np[node]
            return (node, bel, done), None

        # The deepest possible walk is max_depth edges.
        keys = jax.random.split(key, self.ctx.tree.max_depth)
        init = (jnp.int32(0), beliefs, jnp.asarray(False))
        (leaf, bel, _), _ = jax.lax.scan(body, init, keys)
        return leaf, bel

    def _single_action(
        self, root: RootCtx, beliefs: jnp.ndarray, policy: jnp.ndarray,
        key: jax.Array,
    ):
        """One action from the root only (sample_state_single,
        recursive_solving.cc:248-275).  Returns (action, beliefs)."""
        ctx = self.ctx
        rap = self.cfg.random_action_prob
        k_br, k_eps, k_uni, k_hand, k_act = jax.random.split(key, 5)
        br_sampler = jax.random.randint(k_br, (), 0, 2)
        player = root.player
        explore = (player == br_sampler) & (jax.random.uniform(k_eps) < rap)
        a_uniform = jax.random.categorical(
            k_uni, jnp.where(root.mask, 0.0, -jnp.inf)
        )
        hand = jax.random.categorical(k_hand, jnp.log(beliefs[player]))
        a_policy = jax.random.categorical(k_act, jnp.log(policy[0, hand, :]))
        action = jnp.where(explore, a_uniform, a_policy)
        new_row = normalize_safe(
            beliefs[player] * policy[0, :, action], reach_eps(self.dtype)
        )
        beliefs = beliefs.at[player].set(new_row)
        return action, beliefs

    # -------------------------------------------------------------- step
    def step(
        self, ep: EpisodeState, key: jax.Array, value_fn: ValueFn | None
    ) -> tuple[EpisodeState, StepOutput]:
        """One engine step for one lane (vmap over lanes).  Mirrors the
        body of ``RlRunner::step`` (recursive_solving.cc:160-182)."""
        ctx, game = self.ctx, self.game
        t = ctx.tree
        k_solve, k_walk = jax.random.split(key)
        root = RootCtx.of(game, ep.root_bid, ep.root_player)

        state, snap = self._solve_with_snapshot(
            root, ep.beliefs, k_solve, value_fn
        )

        # Training examples for both traversers (subgame_solving.cc:471-474,
        # 672-676): root query + running-mean root values.
        queries = jnp.stack(
            [
                ctx.root_query(ep.beliefs, jnp.int32(0), root),
                ctx.root_query(ep.beliefs, jnp.int32(1), root),
            ]
        )
        values = state.root_values_means

        if self.cfg.sample_leaf:
            leaf, beliefs = self._walk_to_leaf(root, ep.beliefs, snap, k_walk)
            new_bid = jnp.asarray(t.last_bid)[leaf]
            new_player = ctx.node_player(jnp.asarray(t.depth)[leaf], root)
            ended = jnp.asarray(t.is_terminal)[leaf]
        else:
            action, beliefs = self._single_action(root, ep.beliefs, snap, k_walk)
            new_bid = action
            new_player = 1 - root.player
            ended = action == game.liar_call

        fresh = EpisodeState.initial(game, self.dtype)
        new_ep = EpisodeState(
            root_bid=jnp.where(ended, fresh.root_bid, new_bid),
            root_player=jnp.where(ended, fresh.root_player, new_player),
            beliefs=jnp.where(ended, fresh.beliefs, beliefs),
        )
        return new_ep, StepOutput(queries=queries, values=values, ended=ended)

    # ------------------------------------------------------------- batch
    def batch_step(self, eps: EpisodeState, keys: jax.Array, value_fn):
        """Vmapped engine step: ``B`` lanes advance one subgame each.
        Returns (states, StepOutput with leading batch dim)."""
        return jax.vmap(lambda e, k: self.step(e, k, value_fn))(eps, keys)
