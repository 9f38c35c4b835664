"""Batch-last (batch-in-lanes) depth-2 solver.

Performance variant of :mod:`rebel_tpu.solving.grid2`: identical math,
but the subgame batch ``B`` is an explicit **trailing** axis of every
tensor instead of a vmapped leading axis.  On TPU the minor-most axis
maps to the 128-wide vector lanes; with batch-first layouts the tiny
action axis (A = 9..13) sits in the lanes at <10% utilization, while
batch-last keeps all elementwise work and the small-axis reductions
fully lane-parallel across subgames.  The MLP runs transposed
(``W.T @ X`` with features in rows, ``pairs*B`` in lanes/columns), which
also keeps the MXU's big dimension in the batch.

Layouts (``B`` trailing everywhere):

* root tensors    ``[H, A, B]``
* level-1 tensors ``[A1, H, A2, B]``
* beliefs/rvm     ``[2, H, B]``
* root context    ``bid/player [B]``, ``mask [A, B]``

Numerics match grid2/generic/reference exactly (see
tests/test_grid2_batched.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import INITIAL_ACTION, LiarsDice
from rebel_tpu.solving.core import (
    cfr_discounts,
    normalize_safe,
    reach_eps,
    regret_eps,
)
from rebel_tpu.solving.params import SubgameSolvingParams


class Grid2BState(NamedTuple):
    regrets0: jnp.ndarray  # [H, A, B]
    sum0: jnp.ndarray  # [H, A, B]
    last0: jnp.ndarray  # [H, A, B]
    regrets1: jnp.ndarray  # [A, H, A, B]
    sum1: jnp.ndarray  # [A, H, A, B]
    last1: jnp.ndarray  # [A, H, A, B]
    root_values_means: jnp.ndarray  # [2, H, B]
    num_steps: jnp.ndarray  # [2] i32 (shared: lockstep alternation)
    beliefs: jnp.ndarray  # [2, H, B]


class RootCtxB(NamedTuple):
    bid: jnp.ndarray  # [B] i32
    player: jnp.ndarray  # [B] i32
    mask: jnp.ndarray  # [A, B] bool

    @staticmethod
    def of(game: LiarsDice, bid, player) -> "RootCtxB":
        bid = jnp.asarray(bid, jnp.int32)
        a = jnp.arange(game.num_actions)[:, None]
        mask = (a > bid[None, :]) & (
            (bid[None, :] != INITIAL_ACTION) | (a != game.liar_call)
        )
        return RootCtxB(bid=bid, player=jnp.asarray(player, jnp.int32),
                        mask=mask)


def _mlp_batch_last(flax_params: Any, x: jnp.ndarray, compute_dtype):
    """Apply a CFVNet parameter tree to ``x [features, N]`` (features in
    rows).  Equivalent to ``CFVNet.__call__`` with exact GELU."""
    p = flax_params["params"]
    orig = x.dtype
    x = x.astype(compute_dtype)
    k = 0
    while f"Dense_{k + 1}" in p or (
        f"Dense_{k}" in p and f"LayerNorm_{k}" in p
    ):
        d = p[f"Dense_{k}"]
        x = (
            jnp.matmul(
                d["kernel"].astype(compute_dtype).T, x,
                preferred_element_type=compute_dtype,
            )
            + d["bias"].astype(compute_dtype)[:, None]
        )
        if f"LayerNorm_{k}" in p:
            ln = p[f"LayerNorm_{k}"]
            mu = x.mean(axis=0, keepdims=True)
            var = ((x - mu) ** 2).mean(axis=0, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)  # torch LN epsilon
            x = (
                x * ln["scale"].astype(compute_dtype)[:, None]
                + ln["bias"].astype(compute_dtype)[:, None]
            )
        x = jax.nn.gelu(x, approximate=False)
        k += 1
    d = p[f"Dense_{k}"]
    x = (
        jnp.matmul(
            d["kernel"].astype(compute_dtype).T, x,
            preferred_element_type=compute_dtype,
        )
        + d["bias"].astype(compute_dtype)[:, None]
    )
    return x.astype(orig)


@dataclasses.dataclass(frozen=True, eq=False)
class Grid2BatchSolver:
    """Depth-2 CFR/FP over an explicit trailing batch axis."""

    game: LiarsDice
    params: SubgameSolvingParams
    dtype: Any = jnp.float32
    # Value net as a flax CFVNet param tree (applied transposed) OR
    # None => zero leaf values.
    net_params: Any = None
    net_compute_dtype: Any = jnp.float32
    terminal_f32_parity: bool = False

    def __post_init__(self):
        assert self.params.max_depth == 2
        game = self.game
        A = game.num_actions
        liar = game.liar_call
        a1g, a2g = np.meshgrid(np.arange(A), np.arange(A), indexing="ij")
        m1 = (a2g > a1g) & (a1g != liar)
        object.__setattr__(self, "m1", jnp.asarray(m1))  # [A1, A2]
        object.__setattr__(
            self, "pseudo", jnp.asarray(m1 & (a2g != liar))
        )

    # ------------------------------------------------------------ helpers
    def _win_values(self, bids, opp_mass):
        """Payoff of challenged ``bids [..., B]`` vs opponent mass
        ``opp_mass [..., H, B]`` -> ``[..., H, B]``."""
        game = self.game
        D = game.total_num_dice
        faces = bids % game.num_faces  # [..., B]
        quantities = 1 + bids // game.num_faces
        m = jnp.asarray(game.matches_table)  # [H, F]
        # own[..., h, B] = matches(h, face[...]); face one-hot: [..., F, B]
        fsel = (
            faces[..., None, :] == jnp.arange(game.num_faces)[:, None]
        ).astype(self.dtype)
        own = jnp.einsum("hf,...fb->...hb", m.astype(self.dtype), fsel)
        onehot = (
            own[..., None, :] == jnp.arange(D + 1)[:, None]
        ).astype(self.dtype)  # [..., H, D+1, B]
        buckets = (opp_mass[..., None, :] * onehot).sum(-3)  # [..., D+1, B]
        cum = jnp.cumsum(buckets[..., ::-1, :], axis=-2)[..., ::-1, :]
        left = jnp.clip(quantities[..., None, :] - own, 0, D)  # [..., H, B]
        sel = (left[..., None, :] == jnp.arange(D + 1)[:, None]).astype(
            self.dtype
        )  # [..., H, D+1, B]
        p_win = (cum[..., None, :, :] * sel).sum(-2)  # [..., H, B]
        if self.terminal_f32_parity:
            p_win = p_win.astype(jnp.float32).astype(self.dtype)
        return p_win * 2 - opp_mass.sum(-2, keepdims=True)

    def _leaf_values(self, traverser, root: RootCtxB, beliefs, S0, S1):
        """(val_liar1 [H, B], val2 [A1, A2, H, B])."""
        game = self.game
        A = game.num_actions
        H = beliefs.shape[1]
        B = beliefs.shape[-1]
        liar = game.liar_call
        dt = self.dtype
        opp = 1 - traverser
        m0 = root.mask.astype(dt)  # [A, B]
        m1 = self.m1.astype(dt)  # [A1, A2]

        def player_sel(p, arr2):  # arr2 [2, H, B] -> [H, B]
            return jnp.where(jnp.asarray(p) == 0, arr2[0], arr2[1])

        bel_opp = player_sel(opp, beliefs)  # [H, B]
        bel_trav = player_sel(traverser, beliefs)
        root_owns = lambda p: (root.player == p)[None, None, :]  # [1,1,B]

        # S0 [H, A, B] -> per level-1 node: [A1, H, B]
        S0_t = jnp.swapaxes(S0, 0, 1)  # [A, H, B]
        r1_o = bel_opp[None, :, :] * jnp.where(root_owns(opp), S0_t, 1.0)
        r1_o = r1_o * m0[:, None, :]  # [A1, H, B]
        # S1 [A1, H, A2, B] -> [A1, A2, H, B]
        S1_t = jnp.swapaxes(S1, 1, 2)
        r2_o = r1_o[:, None, :, :] * jnp.where(
            root_owns(opp)[None], 1.0, S1_t
        )
        r2_o = r2_o * m1[:, :, None, None]  # [A1, A2, H, B]

        lvl1_player = (root.player + 1) % 2  # [B]
        sign1 = jnp.where(lvl1_player == traverser, 1.0, -1.0)[None, :]
        val_liar1 = sign1 * self._win_values(root.bid, r1_o[liar])  # [H,B]

        sign2 = jnp.where(root.player == traverser, 1.0, -1.0)[None, None, :]
        bids2 = jnp.broadcast_to(
            jnp.arange(A)[:, None], (A, B)
        )  # [A1, B]
        v2_liar = sign2 * self._win_values(bids2, r2_o[:, liar, :, :])

        liar_col = (jnp.arange(A) == liar).astype(dt)[None, :, None, None]
        val2 = v2_liar[:, None, :, :] * liar_col

        if self.net_params is not None:
            r1_t = bel_trav[None, :, :] * jnp.where(
                root_owns(traverser), S0_t, 1.0
            )
            r2_t = r1_t[:, None, :, :] * jnp.where(
                root_owns(traverser)[None], 1.0, S1_t
            )
            reach2_p0 = jnp.where(jnp.asarray(traverser) == 0, r2_t, r2_o)
            reach2_p1 = jnp.where(jnp.asarray(traverser) == 0, r2_o, r2_t)
            eps = reach_eps(dt)
            b0 = normalize_safe(reach2_p0, eps, axis=2)  # [A1,A2,H,B]
            b1 = normalize_safe(reach2_p1, eps, axis=2)
            onehot2 = jnp.broadcast_to(
                jnp.eye(A, dtype=dt)[None, :, :, None], (A, A, A, B)
            )
            pcol = jnp.broadcast_to(
                root.player.astype(dt)[None, None, None, :], (A, A, 1, B)
            )
            tcol = jnp.full((A, A, 1, B), 0, dt) + jnp.asarray(traverser, dt)
            q = jnp.concatenate([pcol, tcol, onehot2, b0, b1], axis=2)
            Q = q.shape[2]
            x = jnp.moveaxis(q, 2, 0).reshape(Q, A * A * B)
            net_vals = _mlp_batch_last(
                self.net_params, x, self.net_compute_dtype
            ).astype(dt)
            net_vals = jnp.moveaxis(
                net_vals.reshape(H, A, A, B), 0, 2
            )  # [A1, A2, H, B]
            scale = r2_o.sum(axis=2, keepdims=True)
            val2 = val2 + jnp.where(
                self.pseudo[:, :, None, None], net_vals * scale, 0.0
            )
        val2 = val2 * m1[:, :, None, None]
        return val_liar1, val2

    def _backup(self, traverser, root: RootCtxB, S0, S1, val_liar1, val2,
                with_regrets):
        game = self.game
        liar = game.liar_call
        m0 = root.mask.astype(self.dtype)  # [A, B]
        m1 = self.m1.astype(self.dtype)  # [A1, A2]
        lvl1_is_trav = ((root.player + 1) % 2 == traverser)[None, None, :]

        q2 = jnp.swapaxes(val2, 1, 2)  # [A1, H, A2, B]
        m1e = m1[:, None, :, None]
        v1_strat = (S1 * m1e * q2).sum(2)  # [A1, H, B]
        v1_sum = val2.sum(1)  # [A1, H, B]
        V1 = jnp.where(lvl1_is_trav, v1_strat, v1_sum)
        is_liar_row = (jnp.arange(m1.shape[0]) == liar)[:, None, None]
        V1 = jnp.where(is_liar_row, val_liar1[None], V1)
        dR1 = None
        root_is_trav = (root.player == traverser)[None, None, :]
        if with_regrets:
            inc1 = q2 - V1[:, :, None, :]
            dR1 = jnp.where(
                lvl1_is_trav[None] & (m1e > 0) & (m0[:, None, None, :] > 0),
                inc1,
                0.0,
            )

        V1_t = jnp.swapaxes(V1, 0, 1)  # [H, A1, B]
        v0_strat = (S0 * m0[None] * V1_t).sum(1)  # [H, B]
        v0_sum = (V1 * m0[:, None, :]).sum(0)  # [H, B]
        V0 = jnp.where(root_is_trav[0], v0_strat, v0_sum)
        dR0 = None
        if with_regrets:
            inc0 = V1_t - V0[:, None, :]
            dR0 = jnp.where(root_is_trav & (m0[None] > 0), inc0, 0.0)
        return V0, V1, (dR0, dR1) if with_regrets else None

    # ---------------------------------------------------------------- init
    def init(self, root: RootCtxB, beliefs: jnp.ndarray) -> Grid2BState:
        """``beliefs [2, H, B]``."""
        game = self.game
        A = game.num_actions
        H = beliefs.shape[1]
        B = beliefs.shape[-1]
        dt = self.dtype
        m0 = root.mask.astype(dt)  # [A, B]
        u0 = jnp.broadcast_to(
            (m0 / jnp.maximum(m0.sum(0, keepdims=True), 1))[None], (H, A, B)
        )
        m1row = self.m1.astype(dt)  # [A1, A2]
        u1_row = m1row / jnp.maximum(m1row.sum(1, keepdims=True), 1)
        u1 = jnp.broadcast_to(
            u1_row[:, None, :, None], (A, H, A, B)
        )
        beliefs = beliefs.astype(dt)
        bel_root = jnp.where(
            (root.player == 0)[None, :], beliefs[0], beliefs[1]
        )  # [H, B]
        bel_lvl1 = jnp.where(
            (root.player == 0)[None, :], beliefs[1], beliefs[0]
        )
        return Grid2BState(
            regrets0=jnp.zeros((H, A, B), dt),
            sum0=u0 * bel_root[:, None, :],
            last0=u0,
            regrets1=jnp.zeros((A, H, A, B), dt),
            sum1=u1 * bel_lvl1[None, :, None, :],
            last1=u1,
            root_values_means=jnp.zeros((2, H, B), dt),
            num_steps=jnp.zeros((2,), jnp.int32),
            beliefs=beliefs,
        )

    # ------------------------------------------------------------ CFR step
    def step_cfr(self, state: Grid2BState, traverser, root: RootCtxB):
        p = self.params
        dt = self.dtype
        traverser = jnp.asarray(traverser, jnp.int32)
        m0 = root.mask.astype(dt)
        m1e = self.m1.astype(dt)[:, None, :, None] * (
            m0[:, None, None, :]
        )  # [A1, 1->H, A2, B] effective mask

        val_liar1, val2 = self._leaf_values(
            traverser, root, state.beliefs, state.last0, state.last1
        )
        V0, V1, (dR0, dR1) = self._backup(
            traverser, root, state.last0, state.last1, val_liar1, val2, True
        )
        regrets0 = state.regrets0 + dR0
        regrets1 = state.regrets1 + dR1

        tr_onehot = (jnp.arange(2) == traverser).astype(dt)  # [2]
        n = (state.num_steps * (jnp.arange(2) == traverser)).sum().astype(dt)
        alpha = 2.0 / (n + 2.0) if p.linear_update else 1.0 / (n + 1.0)
        rvm = state.root_values_means
        rvm = rvm + tr_onehot[:, None, None] * (V0[None] - rvm) * alpha

        num_strategies = n + 1.0
        pos_d, neg_d, strat_d = cfr_discounts(p, num_strategies, dt)

        eps = regret_eps(dt)
        root_is_trav = (root.player == traverser)[None, None, :]  # [1,1,B]
        lvl1_is_trav = ~root_is_trav

        f0 = jnp.maximum(regrets0, eps) * m0[None]
        d0 = f0.sum(1, keepdims=True)
        matched0 = f0 / jnp.where(d0 > 0, d0, 1)
        last0 = jnp.where(root_is_trav, matched0, state.last0)
        regrets0 = jnp.where(
            root_is_trav,
            regrets0 * jnp.where(regrets0 > 0, pos_d, neg_d),
            regrets0,
        )
        bel_trav = jnp.where(
            traverser == 0, state.beliefs[0], state.beliefs[1]
        )  # [H, B]
        sum0 = jnp.where(
            root_is_trav,
            state.sum0 * strat_d + bel_trav[:, None, :] * last0,
            state.sum0,
        )

        f1 = jnp.maximum(regrets1, eps) * (m1e > 0)
        d1 = f1.sum(2, keepdims=True)
        matched1 = f1 / jnp.where(d1 > 0, d1, 1)
        last1 = jnp.where(lvl1_is_trav[None], matched1, state.last1)
        regrets1 = jnp.where(
            lvl1_is_trav[None],
            regrets1 * jnp.where(regrets1 > 0, pos_d, neg_d),
            regrets1,
        )
        sum1 = jnp.where(
            lvl1_is_trav[None],
            state.sum1 * strat_d + bel_trav[None, :, None, :] * last1,
            state.sum1,
        )

        return Grid2BState(
            regrets0=regrets0,
            sum0=sum0,
            last0=last0,
            regrets1=regrets1,
            sum1=sum1,
            last1=last1,
            root_values_means=rvm,
            num_steps=state.num_steps + (jnp.arange(2) == traverser),
            beliefs=state.beliefs,
        )

    # ------------------------------------------------------------- FP step
    def step_fp(self, state: Grid2BState, traverser, root: RootCtxB):
        p = self.params
        dt = self.dtype
        game = self.game
        liar = game.liar_call
        traverser = jnp.asarray(traverser, jnp.int32)
        m0 = root.mask.astype(dt)  # [A, B]
        m0b = root.mask  # bool
        m1b = self.m1[:, None, :, None] & m0b[:, None, None, :]

        avg0, avg1 = self.average_strategy(state, root)
        val_liar1, val2 = self._leaf_values(
            traverser, root, state.beliefs, avg0, avg1
        )

        neg = jnp.asarray(-jnp.inf, dt)
        root_is_trav = (root.player == traverser)[None, None, :]
        lvl1_is_trav = ~root_is_trav

        q2 = jnp.swapaxes(val2, 1, 2)  # [A1, H, A2, B]
        masked2 = jnp.where(m1b, q2, neg)
        has1 = m1b.any(2)  # [A1, 1, B] -> broadcast H
        v1_max = jnp.where(has1, masked2.max(2), 0.0)  # [A1, H, B]
        best1 = masked2.argmax(2)  # [A1, H, B]
        br1 = (
            jnp.arange(game.num_actions)[None, None, :, None]
            == best1[:, :, None, :]
        ).astype(dt)
        br1 = jnp.where(has1[:, :, None, :], br1, 0.0)
        v1_sum = val2.sum(1)
        V1 = jnp.where(lvl1_is_trav, v1_max, v1_sum)
        is_liar_row = (jnp.arange(game.num_actions) == liar)[:, None, None]
        V1 = jnp.where(is_liar_row, val_liar1[None], V1)

        V1_t = jnp.swapaxes(V1, 0, 1)  # [H, A1, B]
        masked0 = jnp.where(m0b[None], V1_t, neg)
        v0_max = masked0.max(1)  # [H, B]
        best0 = masked0.argmax(1)  # [H, B]
        br0 = (
            jnp.arange(game.num_actions)[None, :, None] == best0[:, None, :]
        ).astype(dt)
        v0_sum = (V1 * m0[:, None, :]).sum(0)
        V0 = jnp.where(root_is_trav[0], v0_max, v0_sum)

        tr_onehot = (jnp.arange(2) == traverser).astype(dt)
        num_update = (state.num_steps.sum() // 2 + 1).astype(dt)
        alpha = (
            2.0 / (num_update + 1.0) if p.linear_update else 1.0 / num_update
        )
        rvm = state.root_values_means
        rvm = rvm + tr_onehot[:, None, None] * (V0[None] - rvm) * alpha

        decay = (
            (num_update + 1.0) / (num_update + 2.0) if p.linear_update else 1.0
        )
        bel_trav = jnp.where(
            jnp.asarray(traverser) == 0, state.beliefs[0], state.beliefs[1]
        )
        w0 = bel_trav[:, None, :] * br0
        sum0 = jnp.where(
            root_is_trav, (state.sum0 + w0) * decay, state.sum0
        )
        last0 = jnp.where(root_is_trav, w0, state.last0)
        w1 = bel_trav[None, :, None, :] * br1
        sum1 = jnp.where(
            lvl1_is_trav[None], (state.sum1 + w1) * decay, state.sum1
        )
        last1 = jnp.where(lvl1_is_trav[None], w1, state.last1)

        return Grid2BState(
            regrets0=state.regrets0,
            sum0=sum0,
            last0=last0,
            regrets1=state.regrets1,
            sum1=sum1,
            last1=last1,
            root_values_means=rvm,
            num_steps=state.num_steps + (jnp.arange(2) == traverser),
            beliefs=state.beliefs,
        )

    # ------------------------------------------------------------- common
    def step(self, state, traverser, root):
        if self.params.use_cfr:
            return self.step_cfr(state, traverser, root)
        return self.step_fp(state, traverser, root)

    def multistep(self, state, root):
        def body(carry, it):
            return self.step(carry, it % 2, root), None

        state, _ = jax.lax.scan(
            body, state, jnp.arange(self.params.num_iters)
        )
        return state

    def sampling_strategy(self, state, root):
        if self.params.use_cfr:
            return state.last0, state.last1
        return self.average_strategy(state, root)

    def average_strategy(self, state, root):
        m0 = root.mask.astype(self.dtype)
        m1e = self.m1.astype(self.dtype)[:, None, :, None] * m0[:, None, None, :]
        n0 = state.sum0 + (
            state.last0 if (not self.params.use_cfr and self.params.optimistic)
            else 0.0
        )
        n1 = state.sum1 + (
            state.last1 if (not self.params.use_cfr and self.params.optimistic)
            else 0.0
        )
        n0 = n0 * m0[None]
        n1 = n1 * (m1e > 0)
        d0 = n0.sum(1, keepdims=True)
        d1 = n1.sum(2, keepdims=True)
        a0 = n0 / jnp.where(d0 > 0, d0, 1)
        a1 = n1 / jnp.where(d1 > 0, d1, 1)
        return a0, a1
