"""Specialized depth-2 subgame solver on an *action-grid* layout.

The production ReBeL configuration solves depth-2 subgames everywhere
(``max_depth: 2``, /root/reference/conf/c02_selfplay/liars_sp.yaml:14);
this module is the TPU fast path for that case.  Instead of the generic
node-list layout ``[num_nodes, hands, actions]`` with parent/child
gathers, the depth-2 tree is laid out as dense action grids:

* level-1 node  <->  first action ``a1``            (tensor axis)
* level-2 node  <->  action pair ``(a1, a2)``       (two tensor axes)

so one CFR/FP iteration is pure rectangular elementwise/reduction math —
**zero gathers** — over tensors

* root:    ``[H, A]``    (strategy/regret/sum for the root actor)
* level-1: ``[A, H, A]`` (… for the level-1 actor, indexed by ``a1``)

Semantics are identical to the generic solver (and therefore to the
reference, see tests/test_golden_parity.py): per-iteration regret
matching with linear/DCFR discounting for CFR
(subgame_solving.cc:577-664) and best-response fictitious play
(subgame_solving.cc:421-463).  Depth-2 structure collapses the reach
computations: a player's reach at their own decision nodes is just their
belief vector (the single edge above is owned by the opponent), which
removes the reach re-computation from the average-strategy update.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.solving.core import (
    cfr_discounts,
    RootCtx,
    ValueFn,
    normalize,
    normalize_safe,
    reach_eps,
    regret_eps,
)
from rebel_tpu.solving.params import SubgameSolvingParams


class Grid2State(NamedTuple):
    # Root actor tensors [H, A]; level-1 actor tensors [A, H, A].
    regrets0: jnp.ndarray
    sum0: jnp.ndarray
    last0: jnp.ndarray
    regrets1: jnp.ndarray
    sum1: jnp.ndarray
    last1: jnp.ndarray
    root_values_means: jnp.ndarray  # [2, H]
    num_steps: jnp.ndarray  # [2] i32 (CFR) / [1] aggregated for FP
    beliefs: jnp.ndarray  # [2, H]


def local_hands(hands_axis, x_full, axis=-1):
    """Slice a full-H array down to this shard's hand range on the named
    mesh axis (identity when ``hands_axis`` is falsy)."""
    if not hands_axis:
        return x_full
    n = jax.lax.axis_size(hands_axis)
    idx = jax.lax.axis_index(hands_axis)
    h_loc = x_full.shape[axis] // n
    return jax.lax.dynamic_slice_in_dim(x_full, idx * h_loc, h_loc, axis)


@dataclasses.dataclass(frozen=True, eq=False)
class Grid2Solver:
    """Depth-2 CFR/FP with the action-grid layout.  Covers both solver
    families; selected by ``params.use_cfr``."""

    game: LiarsDice
    params: SubgameSolvingParams
    dtype: jnp.dtype = jnp.float32
    value_fn: ValueFn | None = None
    terminal_f32_parity: bool = False
    # Use the compact pseudo-leaf list (gather/scatter) for net queries
    # instead of the dense (a1, a2) grid.  Dense keeps the iteration free
    # of gathers; compact does ~2.9x less MLP work.  Both are exact.
    compact_queries: bool = False
    # Optional hands-dimension sharding (the "sequence parallelism" analog
    # of this framework — SURVEY §5: num_hands = faces^dice is the
    # exponential scaling axis).  When set to a mesh axis name, all [.., H]
    # tensors hold per-device slices inside a shard_map over that axis;
    # the only cross-hand communication is (a) a psum of the D+1 match
    # buckets in the terminal operator, (b) psums of belief-normalization
    # denominators, and (c) an all_gather of normalized beliefs for the
    # value-net query (whose input is the full PBS by definition).
    hands_axis: str | None = None

    def __post_init__(self):
        assert self.params.max_depth == 2
        game = self.game
        A, H = game.num_actions, game.num_hands
        liar = game.liar_call
        a1g, a2g = np.meshgrid(
            np.arange(A), np.arange(A), indexing="ij"
        )
        # Static level-1 action mask: a2 legal after a1 (liar has none).
        m1 = (a2g > a1g) & (a1g != liar)
        object.__setattr__(self, "m1", jnp.asarray(m1))
        # Pseudo-leaves: level-2 non-terminal nodes (need the net).
        pl = np.stack(np.nonzero(m1 & (a2g != liar)), axis=1)  # [L, 2]
        object.__setattr__(self, "pseudo_pairs", pl)
        object.__setattr__(self, "L", pl.shape[0])
        if pl.shape[0] and self.value_fn is None:
            raise ValueError(
                "depth-2 subgames have non-terminal leaves; provide "
                "value_fn (subgame_solving.cc:177-186)"
            )

    # ------------------------------------------------------------ helpers
    def _m0(self, root: RootCtx) -> jnp.ndarray:
        return root.mask  # [A]

    def _psum(self, x):
        return jax.lax.psum(x, self.hands_axis) if self.hands_axis else x

    def _local_hands(self, x_full, axis=-1):
        return local_hands(self.hands_axis, x_full, axis)

    def _norm_safe(self, x, eps):
        x = x + eps
        return x / self._psum(x.sum(-1, keepdims=True))

    def _win_values(self, bids, opp_mass, f32_parity):
        """``[..., H]`` traverser payoff of challenged ``bids`` against
        opponent reach mass ``opp_mass [..., H]`` (bucket algorithm,
        subgame_solving.cc:765-789).  Under hands sharding the opponent
        sum reduces to a psum of the D+1 buckets."""
        game = self.game
        D = game.total_num_dice
        faces = bids % game.num_faces
        quantities = 1 + bids // game.num_faces
        m = jnp.asarray(game.matches_table)  # [H, F]
        own = self._local_hands(m.T[faces])  # [..., H_local]
        onehot = (own[..., None] == jnp.arange(D + 1)).astype(self.dtype)
        buckets = self._psum(
            (opp_mass[..., None] * onehot).sum(-2)
        )  # [..., D+1]
        cum = jnp.cumsum(buckets[..., ::-1], axis=-1)[..., ::-1]
        left = jnp.clip(quantities[..., None] - own, 0, D)
        # One-hot select instead of a gather: D is tiny (total dice).
        sel = (left[..., None] == jnp.arange(D + 1)).astype(self.dtype)
        p_win = (cum[..., None, :] * sel).sum(-1)
        if f32_parity:
            p_win = p_win.astype(jnp.float32).astype(self.dtype)
        # Direct sum (not buckets.sum) keeps the unsharded path bit-equal
        # to the reference's vector_sum accumulation order.
        return p_win * 2 - self._psum(opp_mass.sum(-1, keepdims=True))

    def _leaf_values(self, traverser, root, beliefs, S0, S1):
        """Leaf values under strategies (S0, S1) for ``traverser``:
        returns (val_liar1 [H], val2 [A, A, H]) with masked-invalid = 0."""
        game = self.game
        A = game.num_actions
        H = beliefs.shape[-1]  # local slice under hands sharding
        liar = game.liar_call
        opp = 1 - traverser
        m0 = self._m0(root)

        root_is = lambda p: root.player == p
        # Opponent reaches at level 1 and 2.
        r1_o = beliefs[opp][None, :] * jnp.where(
            root_is(opp), S0.T, 1.0
        )  # [A1, H]
        r1_o = r1_o * m0[:, None]
        r2_o = r1_o[:, None, :] * jnp.where(
            root_is(opp), 1.0, jnp.swapaxes(S1, 1, 2)
        )  # [A1, A2, H]
        r2_o = r2_o * self.m1[:, :, None]

        # Level-1 liar terminal: challenged bid is the (dynamic) root bid;
        # actor there is the non-root player.
        sign1 = jnp.where((root.player + 1) % 2 == traverser, 1.0, -1.0)
        val_liar1 = sign1 * self._win_values(
            root.bid, r1_o[liar], self.terminal_f32_parity
        )  # [H]

        # Level-2 liar terminals: challenged bid = a1; actor = root player.
        sign2 = jnp.where(root.player == traverser, 1.0, -1.0)
        v2_liar = sign2 * self._win_values(
            jnp.arange(A), r2_o[:, liar, :], self.terminal_f32_parity
        )  # [A1, H]

        # Level-2 pseudo-leaves: value net over the *dense* (a1, a2) grid
        # (invalid/terminal pairs masked afterwards).  Dense rows cost a
        # few extra MLP evaluations (A^2 vs ~A^2/2 valid) but keep the
        # iteration free of gathers/scatters so XLA fuses it into a
        # handful of kernels — the iteration loop is dispatch-bound, not
        # FLOP-bound, at these tensor sizes.
        pseudo_mask = self.m1 & (np.arange(A)[None, :] != liar)  # np static
        liar_col = (jnp.arange(A) == liar).astype(self.dtype)
        val2 = v2_liar[:, None, :] * liar_col[None, :, None]
        if self.L and self.compact_queries:
            pl = self.pseudo_pairs
            r1_t = beliefs[traverser][None, :] * jnp.where(
                root_is(traverser), S0.T, 1.0
            )
            r2_t = r1_t[:, None, :] * jnp.where(
                root_is(traverser), 1.0, jnp.swapaxes(S1, 1, 2)
            )
            reach2_p0 = jnp.where(traverser == 0, r2_t, r2_o)
            reach2_p1 = jnp.where(traverser == 0, r2_o, r2_t)
            eps = reach_eps(self.dtype)
            i1 = jnp.asarray(pl[:, 0])
            i2 = jnp.asarray(pl[:, 1])
            b0 = self._norm_safe(reach2_p0[i1, i2], eps)
            b1 = self._norm_safe(reach2_p1[i1, i2], eps)
            if self.hands_axis:
                b0 = jax.lax.all_gather(b0, self.hands_axis, axis=-1,
                                        tiled=True)
                b1 = jax.lax.all_gather(b1, self.hands_axis, axis=-1,
                                        tiled=True)
            onehot = jnp.asarray(
                np.arange(A)[None, :] == pl[:, 1][:, None], self.dtype
            )
            player_col = jnp.broadcast_to(
                root.player.astype(self.dtype), (self.L,)
            )[:, None]
            trav_col = jnp.broadcast_to(
                jnp.asarray(traverser, self.dtype), (self.L,)
            )[:, None]
            queries = jnp.concatenate(
                [player_col, trav_col, onehot, b0, b1], axis=-1
            )
            net_vals = self.value_fn(queries).astype(self.dtype)
            net_vals = self._local_hands(net_vals)
            scale = self._psum(r2_o[i1, i2].sum(-1, keepdims=True))
            val2 = val2.at[i1, i2].set(net_vals * scale)
        elif self.L:
            r1_t = beliefs[traverser][None, :] * jnp.where(
                root_is(traverser), S0.T, 1.0
            )
            r2_t = r1_t[:, None, :] * jnp.where(
                root_is(traverser), 1.0, jnp.swapaxes(S1, 1, 2)
            )
            reach2_p0 = jnp.where(traverser == 0, r2_t, r2_o)
            reach2_p1 = jnp.where(traverser == 0, r2_o, r2_t)
            eps = reach_eps(self.dtype)
            b0 = self._norm_safe(reach2_p0, eps)  # [A, A, H(_local)]
            b1 = self._norm_safe(reach2_p1, eps)
            if self.hands_axis:
                # The PBS query is the full belief vector by definition.
                b0 = jax.lax.all_gather(
                    b0, self.hands_axis, axis=-1, tiled=True
                )
                b1 = jax.lax.all_gather(
                    b1, self.hands_axis, axis=-1, tiled=True
                )
            hq = b0.shape[-1]
            onehot2 = jnp.asarray(
                np.broadcast_to(np.eye(A)[None, :, :], (A, A, A)), self.dtype
            )
            player_col = jnp.full((A, A, 1), 0, self.dtype) + root.player.astype(
                self.dtype
            )
            trav_col = jnp.full((A, A, 1), 0, self.dtype) + jnp.asarray(
                traverser, self.dtype
            )
            queries = jnp.concatenate(
                [player_col, trav_col, onehot2, b0, b1], axis=-1
            ).reshape(A * A, 2 + A + 2 * hq)
            net_vals = self.value_fn(queries).astype(self.dtype)
            net_vals = self._local_hands(net_vals).reshape(A, A, H)
            scale = self._psum(r2_o.sum(-1, keepdims=True))  # [A, A, 1]
            val2 = val2 + jnp.where(
                jnp.asarray(pseudo_mask)[:, :, None], net_vals * scale, 0.0
            )
        # Zero out invalid pairs.
        val2 = val2 * self.m1[:, :, None]
        return val_liar1, val2

    def _backup(self, traverser, root, S0, S1, val_liar1, val2,
                with_regrets: bool):
        """Returns (V0 [H], V1 [A, H], (dR0, dR1) or None)."""
        game = self.game
        liar = game.liar_call
        m0 = self._m0(root)
        m1 = self.m1
        lvl1_is_trav = (root.player + 1) % 2 == traverser

        # Level-1 values.
        q2 = jnp.swapaxes(val2, 1, 2)  # [A1, H, A2]
        v1_strat = (S1 * m1[:, None, :] * q2).sum(-1)  # [A1, H]
        v1_sum = val2.sum(axis=1)  # [A1, H] (masked already)
        V1 = jnp.where(lvl1_is_trav, v1_strat, v1_sum)
        is_liar_row = (jnp.arange(m1.shape[0]) == liar)[:, None]
        V1 = jnp.where(is_liar_row, val_liar1[None, :], V1)
        dR1 = None
        if with_regrets:
            inc1 = q2 - V1[:, :, None]  # [A1, H, A2]
            dR1 = jnp.where(
                lvl1_is_trav & m1[:, None, :] & m0[:, None, None], inc1, 0.0
            )

        root_is_trav = root.player == traverser
        v0_strat = (S0 * m0[None, :] * V1.T).sum(-1)  # [H]
        v0_sum = (V1 * m0[:, None]).sum(axis=0)
        V0 = jnp.where(root_is_trav, v0_strat, v0_sum)
        dR0 = None
        if with_regrets:
            inc0 = V1.T - V0[:, None]  # [H, A]
            dR0 = jnp.where(root_is_trav & m0[None, :], inc0, 0.0)
        return V0, V1, (dR0, dR1) if with_regrets else None

    # ---------------------------------------------------------------- init
    def init(self, root: RootCtx, beliefs: jnp.ndarray) -> Grid2State:
        game = self.game
        A = game.num_actions
        H = beliefs.shape[-1]  # local slice under hands sharding
        dt = self.dtype
        m0 = self._m0(root)
        u0 = jnp.broadcast_to(
            normalize(m0.astype(dt), m0)[None, :], (H, A)
        )
        u1 = jnp.broadcast_to(
            normalize(self.m1.astype(dt), self.m1)[:, None, :], (A, H, A)
        )
        beliefs = beliefs.astype(dt)
        # Uniform-reach-weighted init (subgame_solving.cc:125-149): each
        # actor's rows scaled by their reach under uniform play — at
        # depth <= 2 that is just their belief vector.
        sum0 = u0 * beliefs[root.player][:, None]
        sum1 = u1 * beliefs[(root.player + 1) % 2][None, :, None]
        return Grid2State(
            regrets0=jnp.zeros((H, A), dt),
            sum0=sum0,
            last0=u0,
            regrets1=jnp.zeros((A, H, A), dt),
            sum1=sum1,
            last1=u1,
            root_values_means=jnp.zeros((2, H), dt),
            num_steps=jnp.zeros((2,), jnp.int32),
            beliefs=beliefs,
        )

    # ------------------------------------------------------------ CFR step
    def step_cfr(self, state: Grid2State, traverser, root: RootCtx):
        p = self.params
        dt = self.dtype
        game = self.game
        traverser = jnp.asarray(traverser, jnp.int32)
        m0, m1 = self._m0(root), self.m1

        val_liar1, val2 = self._leaf_values(
            traverser, root, state.beliefs, state.last0, state.last1
        )
        V0, V1, (dR0, dR1) = self._backup(
            traverser, root, state.last0, state.last1, val_liar1, val2, True
        )
        regrets0 = state.regrets0 + dR0
        regrets1 = state.regrets1 + dR1

        tr_onehot = (jnp.arange(2) == traverser)  # [2]
        n = (state.num_steps * tr_onehot).sum().astype(dt)
        alpha = 2.0 / (n + 2.0) if p.linear_update else 1.0 / (n + 1.0)
        rvm = state.root_values_means
        rvm = rvm + tr_onehot[:, None] * (V0[None, :] - rvm) * alpha

        num_strategies = n + 1.0
        pos_d, neg_d, strat_d = cfr_discounts(p, num_strategies, dt)

        eps = regret_eps(dt)
        root_is_trav = root.player == traverser
        lvl1_is_trav = ~root_is_trav

        # Root level update (only when the root actor is the traverser).
        matched0 = normalize(jnp.maximum(regrets0, eps), m0[None, :])
        last0 = jnp.where(root_is_trav, matched0, state.last0)
        regrets0 = jnp.where(
            root_is_trav,
            regrets0 * jnp.where(regrets0 > 0, pos_d, neg_d),
            regrets0,
        )
        sum0 = jnp.where(
            root_is_trav,
            state.sum0 * strat_d
            + state.beliefs[traverser][:, None] * last0,
            state.sum0,
        )

        # Level-1 update.  Valid rows are m1 & m0[a1] (the generic solver
        # zeroes strategies of root-masked-out level-1 nodes too).
        m1_eff = m1[:, None, :] & m0[:, None, None]
        matched1 = normalize(jnp.maximum(regrets1, eps), m1_eff)
        last1 = jnp.where(lvl1_is_trav, matched1, state.last1)
        regrets1 = jnp.where(
            lvl1_is_trav,
            regrets1 * jnp.where(regrets1 > 0, pos_d, neg_d),
            regrets1,
        )
        sum1 = jnp.where(
            lvl1_is_trav,
            state.sum1 * strat_d
            + state.beliefs[traverser][None, :, None] * last1,
            state.sum1,
        )

        return Grid2State(
            regrets0=regrets0,
            sum0=sum0,
            last0=last0,
            regrets1=regrets1,
            sum1=sum1,
            last1=last1,
            root_values_means=rvm,
            num_steps=state.num_steps + tr_onehot.astype(jnp.int32),
            beliefs=state.beliefs,
        )

    # ------------------------------------------------------------- FP step
    def step_fp(self, state: Grid2State, traverser, root: RootCtx):
        p = self.params
        dt = self.dtype
        traverser = jnp.asarray(traverser, jnp.int32)
        m0, m1 = self._m0(root), self.m1
        m1_eff = m1[:, None, :] & m0[:, None, None]

        # BR target is the current average (optimistic-adjusted when
        # configured, subgame_solving.cc:452-459).
        avg0, avg1 = self.average_strategy(state, root)
        val_liar1, val2 = self._leaf_values(
            traverser, root, state.beliefs, avg0, avg1
        )

        # Best-response backup (BRSolver::compute_br,
        # subgame_solving.cc:316-358): max at the traverser's level with
        # earliest-argmax ties, sum at the opponent's.
        game = self.game
        liar = game.liar_call
        neg = jnp.asarray(-jnp.inf, dt)
        root_is_trav = root.player == traverser
        lvl1_is_trav = ~root_is_trav

        q2 = jnp.swapaxes(val2, 1, 2)  # [A1, H, A2]
        masked2 = jnp.where(m1_eff, q2, neg)
        has1 = m1_eff.any(-1)  # [A1, H]
        v1_max = jnp.where(has1, masked2.max(-1), 0.0)  # [A1, H]
        br1 = jax.nn.one_hot(masked2.argmax(-1), game.num_actions, dtype=dt)
        br1 = jnp.where(has1[..., None], br1, 0.0)
        v1_sum = val2.sum(axis=1)
        V1 = jnp.where(lvl1_is_trav, v1_max, v1_sum)
        V1 = V1.at[liar].set(val_liar1)

        q0 = V1.T  # [H, A]
        masked0 = jnp.where(m0[None, :], q0, neg)
        v0_max = masked0.max(-1)
        br0 = jax.nn.one_hot(masked0.argmax(-1), game.num_actions, dtype=dt)
        v0_sum = jnp.where(m0[:, None], V1, 0.0).sum(axis=0)
        V0 = jnp.where(root_is_trav, v0_max, v0_sum)

        tr_onehot = (jnp.arange(2) == traverser)  # [2]
        num_update = (state.num_steps.sum() // 2 + 1).astype(dt)
        alpha = (
            2.0 / (num_update + 1.0) if p.linear_update else 1.0 / num_update
        )
        rvm = state.root_values_means
        rvm = rvm + tr_onehot[:, None] * (V0[None, :] - rvm) * alpha

        decay = (
            (num_update + 1.0) / (num_update + 2.0) if p.linear_update else 1.0
        )

        w0 = state.beliefs[traverser][:, None] * br0
        sum0 = jnp.where(root_is_trav, (state.sum0 + w0) * decay, state.sum0)
        last0 = jnp.where(root_is_trav, w0, state.last0)

        w1 = state.beliefs[traverser][None, :, None] * br1
        sum1 = jnp.where(lvl1_is_trav, (state.sum1 + w1) * decay, state.sum1)
        last1 = jnp.where(lvl1_is_trav, w1, state.last1)

        return Grid2State(
            regrets0=state.regrets0,
            sum0=sum0,
            last0=last0,
            regrets1=state.regrets1,
            sum1=sum1,
            last1=last1,
            root_values_means=rvm,
            num_steps=state.num_steps + tr_onehot.astype(jnp.int32),
            beliefs=state.beliefs,
        )

    # ------------------------------------------------------------- common
    def step(self, state: Grid2State, traverser, root: RootCtx):
        if self.params.use_cfr:
            return self.step_cfr(state, traverser, root)
        return self.step_fp(state, traverser, root)

    def multistep(self, state: Grid2State, root: RootCtx) -> Grid2State:
        def body(carry, it):
            return self.step(carry, it % 2, root), None

        state, _ = jax.lax.scan(
            body, state, jnp.arange(self.params.num_iters)
        )
        return state

    def sampling_strategy(self, state: Grid2State, root: RootCtx):
        """(policy0 [H, A], policy1 [A, H, A]) — CFR: current iterate;
        FP: average (subgame_solving.cc:682-688, subgame_solving.h:76-83)."""
        if self.params.use_cfr:
            return state.last0, state.last1
        return self.average_strategy(state, root)

    def average_strategy(self, state: Grid2State, root: RootCtx):
        m0 = self._m0(root)
        m1_eff = self.m1[:, None, :] & m0[:, None, None]
        if self.params.use_cfr or not self.params.optimistic:
            return (
                normalize(state.sum0, m0[None, :]),
                normalize(state.sum1, m1_eff),
            )
        return (
            normalize(state.sum0 + state.last0, m0[None, :]),
            normalize(state.sum1 + state.last1, m1_eff),
        )
