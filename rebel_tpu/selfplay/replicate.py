"""Fixed-seed episode replication of the reference ``RlRunner``.

Drives the TPU solver with the *reference's exact RNG stream*
(``std::mt19937`` + libstdc++ distributions via csrc/refrng.cc), calling
the random draws in precisely the order of
``RlRunner::step``/``sample_state_to_leaf``/``sample_state_single``
(/root/reference/csrc/liars_dice/recursive_solving.cc:160-275).  With the
float32-terminal parity mode, the emitted training-example stream
(queries + counterfactual values) replicates the reference's
bit-for-bit — the strongest form of the BASELINE "fixed-seed
trajectory/CFV parity" requirement.  Sequential by construction (it
exists for parity testing, not throughput; the lockstep batched engine
is the production path).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import INITIAL_ACTION, LiarsDice
from rebel_tpu.selfplay.host_store import ReferenceRng
from rebel_tpu.selfplay.runner import RecursiveSolvingParams
from rebel_tpu.solving.core import REACH_EPS_F64, RootCtx
from rebel_tpu.solving.queries import get_query
from rebel_tpu.solving.grid2 import Grid2Solver


def _normalize_safe(x: np.ndarray, eps: float = REACH_EPS_F64) -> np.ndarray:
    x = x + eps
    return x / x.sum()


def _query(game: LiarsDice, traverser, bid, player, beliefs) -> np.ndarray:
    # Single host-side query encoder (queries.get_query).
    return get_query(game, traverser, bid, player, beliefs[0], beliefs[1])


@dataclasses.dataclass
class ReplicatedExample:
    query: np.ndarray
    values: np.ndarray


def replicate_episodes(
    cfg: RecursiveSolvingParams,
    seed: int,
    episodes: int,
    value_fn=None,
) -> list[ReplicatedExample]:
    """Run ``episodes`` reference-equivalent self-play episodes and
    return the training examples in push order."""
    game = cfg.game
    sub = cfg.subgame_params
    assert sub.max_depth == 2
    if value_fn is None:
        from rebel_tpu.nets.value_nets import zero_value_fn

        value_fn = zero_value_fn(game)
    solver = Grid2Solver(
        game=game,
        params=sub,
        dtype=jnp.float64,
        value_fn=value_fn,
        terminal_f32_parity=True,
    )
    rng = ReferenceRng(seed)
    liar = game.liar_call

    @jax.jit
    def solve(root, beliefs, t):
        state = solver.init(root, beliefs)

        def body(carry, it):
            st, snap = carry
            cur = solver.sampling_strategy(st, root)
            snap = jax.tree.map(
                lambda c, s: jnp.where(it == t, c, s), cur, snap
            )
            st = solver.step(st, it % 2, root)
            return (st, snap), None

        snap0 = solver.sampling_strategy(state, root)
        (state, snap), _ = jax.lax.scan(
            body, (state, snap0), jnp.arange(sub.num_iters)
        )
        final = solver.sampling_strategy(state, root)
        snap = jax.tree.map(
            lambda c, s: jnp.where(t == sub.num_iters, c, s), final, snap
        )
        return state.root_values_means, snap

    out: list[ReplicatedExample] = []
    for _ in range(episodes):
        bid, player = INITIAL_ACTION, 0
        beliefs = np.full((2, game.num_hands), 1.0 / game.num_hands)
        while bid != liar:
            root = RootCtx.of(game, bid, player)
            # RNG order mirrors RlRunner::step
            # (recursive_solving.cc:166-181).
            t = rng.uniform_int(0, sub.num_iters)
            rvm, (p0, p1) = solve(root, jnp.asarray(beliefs), t)
            rvm = np.asarray(rvm)
            p0, p1 = np.asarray(p0), np.asarray(p1)

            # sample_state_to_leaf (recursive_solving.cc:192-246) /
            # sample_state_single (recursive_solving.cc:248-275).
            br_sampler = rng.uniform_int(0, 1)
            walk_beliefs = beliefs.copy()
            steps = 2 if cfg.sample_leaf else 1
            cur_bid, cur_player = bid, player
            for depth in range(steps):
                if cur_bid == liar:
                    break
                lo, hi = game.bid_range(cur_bid)
                policy = p0 if depth == 0 else p1[cur_bid]
                eps_draw = rng.uniform_float()
                if cur_player == br_sampler and eps_draw < cfg.random_action_prob:
                    action = rng.uniform_int(lo, hi - 1)
                else:
                    hand = rng.discrete(walk_beliefs[cur_player])
                    action = rng.discrete(policy[hand])
                walk_beliefs[cur_player] = _normalize_safe(
                    walk_beliefs[cur_player] * policy[:, action]
                )
                cur_bid, cur_player = action, 1 - cur_player

            # Examples pushed after the solve finishes
            # (subgame_solving.cc:471-474).
            for trav in (0, 1):
                out.append(
                    ReplicatedExample(
                        query=_query(game, trav, bid, player, beliefs),
                        values=rvm[trav].astype(np.float32),
                    )
                )
            bid, player = cur_bid, cur_player
            beliefs = walk_beliefs
    return out
