"""Value-net function backends.

The solver consumes a plain function ``queries [L, Q] -> values [L, H]``
(the TPU-native equivalent of ``IValueNet::compute_values``,
/root/reference/csrc/liars_dice/net_interface.h:20-33).  This module
provides the reference's stub backends
(/root/reference/csrc/liars_dice/real_net.cc):

* :func:`zero_value_fn` — constant zeros (ZeroOutputNet, real_net.cc:30-55);
  exercises plumbing without a model.
* :func:`make_oracle_value_fn` — answers each query by *actually solving*
  the full game from the queried state (OracleNetSolver,
  real_net.cc:89-123).  Unlike the reference's one-query-at-a-time loop
  (real_net.cc:96-102) this is a pure JAX program vmapped over the query
  batch, so it composes with jit/vmap/scan in the calling solver.

The trainable flax MLP lives in :mod:`rebel_tpu.nets.cfv_net`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.solving.core import RootCtx, SolverContext
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.tree import build_supertree


def zero_value_fn(game: LiarsDice):
    def value_fn(queries: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros(queries.shape[:-1] + (game.num_hands,), queries.dtype)

    # Marker consumed by Grid2FrontierSolver's pallas-engine guard: a
    # zero value_fn without net_params is a legitimate zero-net eval,
    # any other value_fn without net_params would be silently ignored.
    value_fn.__wrapped_kind__ = "zero"
    return value_fn


def decode_query_arrays(game: LiarsDice, query: jnp.ndarray):
    """Traced decode of one query row -> (traverser, last_bid, player,
    beliefs [2, H]).  Array counterpart of ``deserialize_query``
    (subgame_solving.cc:910-929)."""
    A, H = game.num_actions, game.num_hands
    player = query[0].astype(jnp.int32)
    traverser = query[1].astype(jnp.int32)
    onehot = query[2 : 2 + A]
    last_bid = jnp.where(
        onehot.max() > 0.5, jnp.argmax(onehot).astype(jnp.int32), -1
    )
    beliefs = jnp.stack([query[2 + A : 2 + A + H], query[2 + A + H :]])
    return traverser, last_bid, player, beliefs


def make_oracle_value_fn(
    game: LiarsDice,
    params: SubgameSolvingParams,
    dtype=jnp.float32,
    sequential: bool = False,
):
    """Ground-truth oracle: full-depth solve per query on a masked
    supertree (one static topology covers every queried root state)."""
    from rebel_tpu.solving.solver import build_solver

    tree = build_supertree(game, max_depth=None)
    ctx = SolverContext(game=game, tree=tree, dtype=dtype)
    solver = build_solver(ctx, params, value_fn=None)

    def one(query: jnp.ndarray) -> jnp.ndarray:
        traverser, last_bid, player, beliefs = decode_query_arrays(game, query)
        root = RootCtx.of(game, last_bid, player)
        state = solver.init(root, beliefs.astype(dtype))
        state = solver.multistep(state, root)
        return state.root_values_means[traverser]

    def value_fn(queries: jnp.ndarray) -> jnp.ndarray:
        if sequential:  # lower peak memory for big query batches
            return jax.lax.map(one, queries)
        return jax.vmap(one)(queries)

    return value_fn
