"""Strategy statistics and net-quality diagnostics.

Ports ``compute_stategy_stats`` (TreeStrategyStats,
/root/reference/csrc/liars_dice/subgame_solving.cc:823-899) and
``eval_net`` (/root/reference/csrc/liars_dice/stats.cc:44-153) — the
``eval_mse/net_reach`` / ``eval_mse/fp_reach`` training metrics
(cfvpy/selfplay.py:555-570) — as array programs.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.solving.core import (
    RootCtx,
    SolverContext,
    ValueFn,
    normalize_safe,
    reach_eps,
)
from rebel_tpu.solving.exploitability import full_tree_context, uniform_beliefs
from rebel_tpu.solving.params import SubgameSolvingParams


@dataclasses.dataclass
class TreeStrategyStats:
    """Mirrors subgame_solving.h:153-174."""

    reach_probabilities: np.ndarray  # [2, N, H]
    values: np.ndarray  # [2, N, H]
    node_values: np.ndarray  # [2, N]
    node_reach: np.ndarray  # [N]


@partial(jax.jit, static_argnums=0)
def _strategy_stats(ctx: SolverContext, strategy: jnp.ndarray):
    game, t = ctx.game, ctx.tree
    root = RootCtx.concrete(t)
    amask = ctx.action_masks(root)
    beliefs = uniform_beliefs(game, ctx.dtype)
    eps = reach_eps(ctx.dtype)

    reaches = jnp.stack(
        [
            ctx.compute_reaches(strategy, beliefs[0], 0, root),
            ctx.compute_reaches(strategy, beliefs[1], 1, root),
        ]
    )  # [2, N, H]
    node_reach = reaches[0].sum(-1) * reaches[1].sum(-1)  # [N]

    # Per-player expected values under normalized opponent beliefs
    # (subgame_solving.cc:847-886).
    values = []
    for player in (0, 1):
        op_beliefs = normalize_safe(reaches[1 - player], eps, axis=-1)
        v = jnp.zeros((ctx.N, ctx.H), ctx.dtype)
        # Terminal rows: expected terminal value vs normalized op beliefs.
        tv = ctx.terminal_values(op_beliefs, jnp.int32(player), root)
        if t.terminal_ids.size:
            v = v.at[jnp.asarray(t.terminal_ids)].set(tv)
        for d in reversed(range(len(t.level_slices) - 1)):
            ls, le = t.level_slices[d]
            if not (t.num_children[ls:le] > 0).any():
                continue
            cvals = ctx.gather_child_values(v, ls, le)  # [n, A, H]
            m = amask[ls:le]
            cvals = jnp.where(m[:, :, None], cvals, 0)
            strat = strategy[ls:le]  # [n, H, A]
            v_own = jnp.einsum("nha,nah->nh", strat, cvals)
            # Opponent nodes: weight each action by the op's average
            # action probability under their normalized beliefs.
            action_prob = jnp.einsum(
                "nha,nh->na", strat, op_beliefs[ls:le]
            )  # [n, A]
            v_opp = jnp.einsum("na,nah->nh", action_prob, cvals)
            actor_is_player = ctx.node_player(d, root) == player
            vn = jnp.where(actor_is_player, v_own, v_opp)
            keep = jnp.asarray(t.is_leaf[ls:le])[:, None]
            v = v.at[ls:le].set(jnp.where(keep, v[ls:le], vn))
        values.append(v)
    values = jnp.stack(values)  # [2, N, H]

    # node_values[p][n] under normalize(reach_p, 1e-6)
    # (subgame_solving.cc:887-896).
    own_beliefs = normalize_safe(reaches, 1e-6, axis=-1)
    node_values = jnp.einsum("pnh,pnh->pn", own_beliefs, values)
    return reaches, values, node_values, node_reach


def compute_strategy_stats(
    ctx: SolverContext, strategy
) -> TreeStrategyStats:
    reaches, values, node_values, node_reach = _strategy_stats(
        ctx, jnp.asarray(strategy, ctx.dtype)
    )
    return TreeStrategyStats(
        reach_probabilities=np.asarray(reaches),
        values=np.asarray(values),
        node_values=np.asarray(node_values),
        node_reach=np.asarray(node_reach),
    )


@lru_cache(maxsize=8)
def _br_value_solver(game: LiarsDice, fp_iters: int, dtype_name: str):
    """Cached jitted vmapped full-depth BR solve returning
    root_values_means — rebuilding (and re-jitting) this per eval_net
    call recompiled the most expensive program twice per trainer eval
    epoch."""
    from rebel_tpu.eval.recursive import BatchSubgameSolver

    dtype = jnp.dtype(dtype_name)
    params = SubgameSolvingParams(
        num_iters=fp_iters, max_depth=10000, linear_update=True
    )
    solver = BatchSubgameSolver(
        game, params, dtype, None, max_depth=None
    ).solver

    def solve_values(bid, player, bel):
        root = RootCtx.of(game, bid, player)
        state = solver.init(root, bel)
        state = solver.multistep(state, root)
        return state.root_values_means  # [2, H]

    return jax.jit(jax.vmap(solve_values))


def eval_net(
    game: LiarsDice,
    net_strategy: np.ndarray,
    full_strategy: np.ndarray,
    mdp_depth: int,
    fp_iters: int,
    value_fn: ValueFn,
    traverse_by_net: bool,
    dtype=jnp.float64,
    min_reach: float = 1e-6,
) -> float:
    """MSE between net values and fresh full-solve BR values over the
    most-reachable depth-``d`` and ``2d`` non-terminal nodes
    (stats.cc:44-153)."""
    from rebel_tpu.solving.queries import get_query

    ctx = full_tree_context(game, dtype)
    t = ctx.tree
    stats = compute_strategy_stats(
        ctx, net_strategy if traverse_by_net else full_strategy
    )

    sel = (
        ((t.depth == mdp_depth) | (t.depth == 2 * mdp_depth))
        & ~t.is_terminal
    )
    ids = np.nonzero(sel)[0]
    if ids.size == 0:
        return 0.0
    ids = ids[np.argsort(-stats.node_reach[ids], kind="stable")]
    ids = ids[stats.node_reach[ids] >= min_reach]
    if ids.size == 0:
        return 0.0

    # Per-node beliefs from the traversing policy's reaches.
    b0 = stats.reach_probabilities[0][ids]
    b0 = b0 / b0.sum(-1, keepdims=True)
    b1 = stats.reach_probabilities[1][ids]
    b1 = b1 / b1.sum(-1, keepdims=True)
    beliefs = np.stack([b0, b1], axis=1)  # [K, 2, H]

    # Fresh full-depth solves at each node (batched on the supertree).
    bids = t.last_bid[ids].astype(np.int32)
    players = (t.depth[ids] % 2).astype(np.int32)
    vmapped = _br_value_solver(game, fp_iters, jnp.dtype(dtype).name)
    br_values = []
    # Supertree lanes are full-tree-sized regardless of root, so the
    # lane count must scale with the game: 128 lanes of 1x6f's
    # [8191, 6, 13] solver state is multi-GB of live scan buffers and
    # crashed the TPU worker outright (r4_1x6fp epoch-0 evals).  Cap
    # the primary per-chunk array block at ~128 MB.
    per_lane = t.num_nodes * game.num_hands * game.num_actions * 4
    chunk = int(max(8, min(128, 2 ** np.floor(np.log2(
        max(1, (128 << 20) // (4 * per_lane)))))))
    for lo in range(0, ids.size, chunk):
        hi = min(lo + chunk, ids.size)
        pad = chunk - (hi - lo)
        pad_rows = lambda x: np.concatenate(
            [x[lo:hi]] + ([x[lo : lo + 1]] * pad if pad else []), axis=0
        )
        out = vmapped(
            jnp.asarray(pad_rows(bids)),
            jnp.asarray(pad_rows(players)),
            jnp.asarray(pad_rows(beliefs), dtype),
        )
        br_values.append(np.asarray(out)[: hi - lo])
    br_values = np.concatenate(br_values, axis=0)  # [K, 2, H]

    # Net values for the same queries.
    queries = np.stack(
        [
            get_query(
                game, trav, int(t.last_bid[n]), int(t.depth[n] % 2),
                beliefs[k][0], beliefs[k][1],
            )
            for k, n in enumerate(ids)
            for trav in (0, 1)
        ]
    )  # [2K, Q]
    net_values = np.asarray(value_fn(jnp.asarray(queries)))  # [2K, H]
    net_values = net_values.reshape(ids.size, 2, game.num_hands)

    mses = []
    for k in range(ids.size):
        for trav in (0, 1):
            w = beliefs[k][trav]
            nv = float((net_values[k, trav] * w).sum())
            bv = float((br_values[k, trav] * w).sum())
            mses.append((nv - bv) ** 2)
    return float(np.mean(mses))
