"""Pallas TPU kernel: the whole depth-2 subgame solve in one kernel.

The XLA lowering of the iteration loop (grid2/grid2b) dispatches dozens
of small kernels per CFR iteration; at the production sizes the loop is
dispatch/HBM-bound, not FLOP-bound.  This module fuses the *entire*
``num_iters`` iteration loop — solver state, terminal operator, and the
CFV MLP — into a single Pallas kernel per block of lanes:

* grid: ``B / LANE_BLOCK`` programs; each owns ``LANE_BLOCK`` subgames;
* all solver state lives in VMEM for the whole loop (``~6 KB/lane``);
* tensors are laid out batch-last (``[..., LANE_BLOCK]``) so the vector
  lanes parallelize across subgames (see grid2b.py for the layout
  rationale);
* the MLP runs transposed on the MXU (``W.T @ X``), with the compact
  pseudo-leaf pair list assembled by static unrolled slicing;
* HBM traffic per solve is one read of the inputs and one write of the
  outputs — nothing per iteration.

Math is identical to grid2/grid2b (see tests/test_grid2_pallas.py).
"""

from __future__ import annotations

import dataclasses

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rebel_tpu.games.liars_dice import INITIAL_ACTION, LiarsDice
from rebel_tpu.solving.core import cfr_discounts, reach_eps, regret_eps
from rebel_tpu.solving.params import SubgameSolvingParams


class Grid2PallasOutputs(NamedTuple):
    rvm: jnp.ndarray  # [B, 2, H]
    snap0: jnp.ndarray  # [B, H, A]  sampling policy at per-lane t
    snap1: jnp.ndarray  # [B, A, H, A]


@dataclasses.dataclass(frozen=True, eq=False)
class Grid2PallasSolver:
    """Fused multistep for the depth-2 production configuration."""

    game: LiarsDice
    params: SubgameSolvingParams
    lane_block: int = 128
    net_compute_dtype: Any = jnp.float32
    # Split the per-iteration MLP batch into column chunks to cap live
    # activation VMEM ([256, P*LB/chunks] at a time); results identical.
    mlp_chunks: int = 1
    # 2 = split each lane block into two half-blocks and software-
    # pipeline their iterations so one block's MXU-heavy leaf/MLP pass
    # overlaps the other's VPU regret update.  CFR-with-net only (other
    # configs fall back to 1).  Results identical to interleave=1
    # (tests/test_grid2_pallas.py).
    interleave: int = 1
    # GELU policy: "auto" = polynomial fast GELU on the bf16 fast path
    # (|gelu err| < 1.8e-3, below bf16 matmul rounding), exact A&S erf
    # GELU when computing in f32 (the parity path); "exact"/"fast"
    # force either.
    gelu: str = "auto"
    # Perf-diagnosis knob (bench.py --ablate): "nogelu" (identity
    # activation), "noln" (skip LayerNorm statistics), "cheaperf"
    # (force the fast polynomial GELU).  "" = follow ``gelu``.
    ablate: str = ""
    interpret: bool = False

    def __post_init__(self):
        assert self.params.max_depth == 2
        game = self.game
        A = game.num_actions
        liar = game.liar_call
        a1g, a2g = np.meshgrid(np.arange(A), np.arange(A), indexing="ij")
        m1 = (a2g > a1g) & (a1g != liar)
        object.__setattr__(self, "m1_np", m1)
        pl_pairs = np.stack(np.nonzero(m1 & (a2g != liar)), axis=1)
        object.__setattr__(self, "pairs", pl_pairs)  # [P, 2]

    # ------------------------------------------------------------- kernel
    def _kernel(self, net_param_list, net_layout, matches_ref, payoff_ref,
                bel_ref, bid_ref, player_ref, t_ref,
                rvm_ref, snap0_ref, snap1_ref):
        game = self.game
        p = self.params
        A, H = game.num_actions, game.num_hands
        D = game.total_num_dice
        liar = game.liar_call
        LB = self.lane_block
        dt = jnp.float32
        eps_regret = regret_eps(dt)
        eps_reach = reach_eps(dt)
        matches_f = matches_ref[...]  # [H, F] f32

        FULL_LB = LB
        nsub = (
            self.interleave
            if (p.use_cfr and net_param_list and self.interleave > 1)
            else 1
        )
        assert FULL_LB % nsub == 0, (FULL_LB, nsub)

        def make_block(lo):
            """All per-lane-block solver state and closures.

            ``nsub == 1`` binds the whole program block and traces the
            exact original single-block program (``lane``/``store`` are
            identity).  ``nsub == 2`` (``interleave=2``) builds two
            independent half-blocks whose iteration phases are software-
            pipelined in the dispatch below so each block's MXU-heavy
            leaf evaluation sits adjacent to the OTHER block's
            independent VPU update — giving the scheduler matrix/vector
            work it can overlap."""
            LB = FULL_LB // nsub

            def lane(x):
                return x if nsub == 1 else x[..., lo : lo + LB]

            def store(ref, val):
                if nsub == 1:
                    ref[...] = val
                else:
                    ref[..., lo : lo + LB] = val

            def iota(shape, dim):
                return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

            def m1_mask(shape, a1_dim, a2_dim):
                """Level-1 legality mask built at the consumer's shape via
                iota (Mosaic cannot shape-cast trailing-dim inserts)."""
                a1 = iota(shape, a1_dim)
                a2 = iota(shape, a2_dim)
                return (a2 > a1) & (a1 != liar)

            def m0_mask(shape, a_dim):
                """Root legality at the consumer's shape; lane dim last."""
                a = iota(shape, a_dim)
                bshape = [1] * (len(shape) - 1) + [shape[-1]]
                b = bid.reshape(bshape)
                return (a > b) & ((b != INITIAL_ACTION) | (a != liar))

            bid = lane(bid_ref[0, :])  # [LB] i32
            player = lane(player_ref[0, :])
            t_stop = lane(t_ref[0, :])
            beliefs = lane(bel_ref[...])  # [2, H, LB]
            arangeA = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)  # [A,1]
            m0 = (arangeA > bid[None, :]) & (
                (bid[None, :] != INITIAL_ACTION) | (arangeA != liar)
            )  # [A, LB]
            m0f = m0.astype(dt)

            # ---- loop-invariant masks, hoisted out of the iteration loop.
            # (Inside fori_loop Mosaic does not reliably hoist these; at
            # 1024 iterations the rebuild cost is the dominant VPU load.)
            m1e_b = m1_mask((A, H, A, LB), 0, 2)  # [A1,H,A2,LB] bool
            m0e_b = m0_mask((A, H, A, LB), 0)
            m1e_f = m1e_b.astype(dt)
            m1eff_b = m1e_b & m0e_b
            m1eff_f = m1eff_b.astype(dt)
            m1_2d = m1_mask((A, A, H, LB), 0, 1).astype(dt)  # [A1,A2,H,LB]

            bel_p0, bel_p1 = beliefs[0], beliefs[1]  # [H, LB]
            root_is0 = (player == 0)[None, :]  # [1, LB]
            bel_root = jnp.where(root_is0, bel_p0, bel_p1)
            bel_lvl1 = jnp.where(root_is0, bel_p1, bel_p0)

            # Uniform init (subgame_solving.cc:125-149).
            u0 = jnp.broadcast_to(
                (m0f / jnp.maximum(m0f.sum(0, keepdims=True), 1.0))[None],
                (H, A, LB),
            )
            u1m = m1e_f
            u1cnt = jnp.maximum(
                (A - 1 - iota((A, H, A, LB), 0)).astype(dt), 1.0
            )
            u1 = u1m / u1cnt

            # Root-terminal win operator.  p_win[h] = sum_{h'} opp[h'] *
            # [matches(h') >= clip(quantity - matches(h), 0, D)], so the
            # whole bid-dependent part is one [H, H', LB] comparison matrix
            # computed once (the suffix-sum/bucket route of the reference,
            # subgame_solving.cc:765-789, collapsed algebraically).
            faces_inv = bid % game.num_faces  # [LB]
            quant_inv = 1 + bid // game.num_faces
            fsel_inv = (
                faces_inv[None, :]
                == jax.lax.broadcasted_iota(jnp.int32, (game.num_faces, 1), 0)
            ).astype(dt)  # [F, LB]
            own_inv = jnp.einsum(
                "hf,fb->hb", matches_f, fsel_inv, preferred_element_type=dt
            )  # [H, LB]
            left_inv = jnp.clip(quant_inv[None, :] - own_inv, 0, D)  # [H, LB]
            M_win = (own_inv[None] >= left_inv[:, None, :]).astype(dt)  # [H,H',LB]

            def win_values_root(opp_mass):
                """Terminal payoff vs dynamic root bid: [H, LB]."""
                p_win = (M_win * opp_mass[None]).sum(1)  # [H, LB]
                return p_win * 2 - opp_mass.sum(0, keepdims=True)

            def win_values_lvl2(opp_mass):
                """Terminal payoff of challenged bid a1: opp_mass [A1, H, LB]
                -> [A1, H, LB] via the static payoff tensor (einsum on MXU;
                the liar row of the padded tensor is zero)."""
                return jnp.einsum(
                    "aho,aob->ahb", payoff_ref[...], opp_mass,
                    preferred_element_type=dt,
                )

            def gelu_erf(x):
                """Exact-erf GELU via the Abramowitz-Stegun 7.1.26 polynomial
                (|err| < 1.5e-7); Mosaic has no native erf/erfc."""
                z = x * jnp.asarray(0.7071067811865476, x.dtype)
                az = jnp.abs(z)
                t = 1.0 / (1.0 + 0.3275911 * az)
                poly = t * (
                    0.254829592
                    + t
                    * (
                        -0.284496736
                        + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
                    )
                )
                erf_abs = 1.0 - poly * jnp.exp(-az * az)
                erf = jnp.sign(z) * erf_abs
                return x * 0.5 * (1.0 + erf)

            def gelu_cheap(x):
                """GELU with erf(z) ~ clip(z)*poly6(z^2) (pure FMA chain, no
                exp/div/sign; |gelu err| < 1.8e-3 — below the bf16 matmul
                noise already accepted on the fast path)."""
                z = x * jnp.asarray(0.7071067811865476, x.dtype)
                z = jnp.clip(z, -2.4, 2.4)
                u = z * z
                poly = 1.1283452779263845 + u * (
                    -0.37547712975483916
                    + u
                    * (
                        0.11078739955649257
                        + u
                        * (
                            -0.024381732600758942
                            + u
                            * (
                                0.0037230956091636926
                                + u
                                * (
                                    -0.00034346830302456875
                                    + u * 1.40787036032954e-05
                                )
                            )
                        )
                    )
                )
                # x * (0.5 + 0.5*(z*poly)): mul + FMA + mul epilogue.
                return x * (0.5 + 0.5 * (z * poly))

            if self.ablate == "nogelu":
                act = lambda x: x
            elif self.ablate == "cheaperf" or self.gelu == "fast" or (
                self.gelu == "auto"
                and self.net_compute_dtype == jnp.bfloat16
            ):
                act = gelu_cheap
            else:
                act = gelu_erf

            # Net params read + cast ONCE (hoisted; per-iteration re-reads
            # and f32->bf16 casts of the weights are pure VPU waste).
            cdt = self.net_compute_dtype
            net_consts = []
            if net_param_list:
                # net_layout: one bool per hidden layer — True when the
                # layer carries LayerNorm scale/bias leaves (4 leaves),
                # False for a plain Linear->GELU layer (2 leaves, the
                # CFVNet use_layer_norm=False path).
                i = 0
                for has_ln in net_layout:
                    W, b = net_param_list[i : i + 2]
                    i += 2
                    if has_ln:
                        scale, bias = net_param_list[i : i + 2]
                        i += 2
                        scale_col = scale[...].astype(jnp.float32)[:, None]
                        bias_col = bias[...].astype(jnp.float32)[:, None]
                    else:
                        scale_col = bias_col = None
                    # NB: transpose in 32-bit, cast last — Mosaic does not
                    # lower several 16-bit relayout ops.
                    net_consts.append((
                        W[...].T.astype(cdt),
                        b[...].astype(jnp.float32)[:, None],
                        scale_col,
                        bias_col,
                    ))
                W, b = net_param_list[i : i + 2]
                head_consts = (
                    W[...].T.astype(cdt),
                    b[...].astype(jnp.float32)[:, None],
                )

            def mlp(x):
                """x [Q, N] -> [H, N] via the CFVNet params (transposed).

                Matmul inputs in cdt (bf16 rides the MXU natively) with f32
                accumulators; ALL elementwise math (LayerNorm, GELU) stays
                f32 — this target's VPU has no native 16-bit arithmetic, so
                bf16 elementwise would be emulated with per-op converts and
                is measurably slower.
                """
                if not net_param_list:
                    return jnp.zeros((H, x.shape[1]), dt)
                for W_t, b_col, scale_col, bias_col in net_consts:
                    x = (
                        jnp.dot(
                            W_t, x.astype(cdt),
                            preferred_element_type=jnp.float32,
                        )
                        + b_col
                    )
                    if scale_col is None:
                        # Plain Linear->GELU layer (no LayerNorm).
                        x = act(x)
                        continue
                    if self.ablate != "noln":
                        # One-pass LN: mean and E[x^2] reduced together,
                        # normalize+affine as two per-element FMAs
                        # (x*r - mu*r, then *scale + bias).  Same math as
                        # (x-mu)/sqrt(var+eps) modulo f32 reassociation —
                        # activations are O(1-10) over 256 rows, so the
                        # E[x^2]-mu^2 cancellation is far below the 1e-5
                        # parity tolerance.
                        inv_n = 1.0 / x.shape[0]
                        mu = x.sum(axis=0, keepdims=True) * inv_n
                        ex2 = (x * x).sum(axis=0, keepdims=True) * inv_n
                        var = jnp.maximum(ex2 - mu * mu, 0.0)
                        r = jax.lax.rsqrt(var + 1e-5)  # torch LN epsilon
                        x = x * r - mu * r
                    x = x * scale_col + bias_col
                    x = act(x)
                W_t, b_col = head_consts
                x = (
                    jnp.dot(
                        W_t, x.astype(cdt), preferred_element_type=jnp.float32
                    )
                    + b_col
                )
                return x.astype(dt)

            P = self.pairs.shape[0]

            # Query rows that do not change across iterations, hoisted:
            # player id repeated per pair [1, P*LB] and the one-hot(a2)
            # block [A, P*LB] (a compile-time pattern).
            prow_full = jnp.concatenate(
                [player.astype(dt)[None, :]] * P, axis=1
            )  # [1, P*LB]
            onehot_full = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        (
                            jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0) == a2
                        ).astype(dt),
                        (A, LB),
                    )
                    for _, a2 in self.pairs
                ],
                axis=1,
            )  # [A, P*LB]

            def leaf_values(traverser, S0, S1):
                trav_is0 = traverser == 0
                bel_opp = jnp.where(trav_is0, bel_p1, bel_p0)
                bel_trav = jnp.where(trav_is0, bel_p0, bel_p1)
                opp_is_root = jnp.logical_xor(root_is0, trav_is0)  # [1, LB]

                S0_t = jnp.swapaxes(S0, 0, 1)  # [A, H, LB]
                r1_o = bel_opp[None] * jnp.where(opp_is_root, S0_t, 1.0)
                r1_o = r1_o * m0f[:, None, :]
                S1_t = jnp.swapaxes(S1, 1, 2)  # [A1, A2, H, LB]
                r2_o = r1_o[:, None] * jnp.where(
                    opp_is_root[None], 1.0, S1_t
                )
                r2_o = r2_o * m1_2d

                trav_int = jnp.asarray(traverser, jnp.int32)
                lvl1_player = (player + 1) % 2
                sign1 = jnp.where(lvl1_player == trav_int, 1.0, -1.0)[None, :]
                val_liar1 = sign1 * win_values_root(r1_o[liar])  # [H, LB]

                sign2 = jnp.where(player == trav_int, 1.0, -1.0)[None, None, :]
                v2_liar = sign2 * win_values_lvl2(r2_o[:, liar])  # [A1, H, LB]

                # Net queries over the compact pair list.
                r1_t = bel_trav[None] * jnp.where(~opp_is_root, S0_t, 1.0)
                r1_t = r1_t * m0f[:, None, :]
                r2_t = r1_t[:, None] * jnp.where(
                    ~opp_is_root[None], 1.0, S1_t
                )
                r2_t = r2_t * m1_2d
                r2_0 = jnp.where(trav_is0, r2_t, r2_o)
                r2_1 = jnp.where(trav_is0, r2_o, r2_t)

                # Normalize the whole [A1, A2, H, LB] grids densely (three
                # wide VPU ops) instead of 2*P small per-pair normalizes.
                def norm_grid(x):
                    x = x + eps_reach
                    return x / x.sum(2, keepdims=True)

                # Slice pair cells at *major* dims only ([a1, a2] leading):
                # Mosaic concat requires matching sublane offsets.
                b0g = norm_grid(r2_0)  # [A1, A2, H, LB]
                b1g = norm_grid(r2_1)
                b0_full = jnp.concatenate(
                    [b0g[a1, a2] for a1, a2 in self.pairs], axis=1
                )  # [H, P*LB]
                b1_full = jnp.concatenate(
                    [b1g[a1, a2] for a1, a2 in self.pairs], axis=1
                )
                trow_full = jnp.broadcast_to(
                    jnp.asarray(traverser, dt)[None, None], (1, P * LB)
                )
                X = jnp.concatenate(
                    [prow_full, trow_full, onehot_full, b0_full, b1_full],
                    axis=0,
                )  # [Q, P*LB]

                nch = max(1, self.mlp_chunks)
                per = (P + nch - 1) // nch
                outs = []
                for c0 in range(0, P, per):
                    outs.append(mlp(X[:, c0 * LB : (c0 + per) * LB]))
                net_out = jnp.concatenate(outs, axis=1)  # [H, P*LB]

                # Counterfactual rescale: opponent reach mass per leaf.
                mass = r2_o.sum(2, keepdims=True)  # [A1, A2, 1, LB]
                scale_full = jnp.concatenate(
                    [mass[a1, a2] for a1, a2 in self.pairs], axis=1
                )  # [1, P*LB]
                net_out = net_out * scale_full
                updates = {}
                for idx, (a1, a2) in enumerate(self.pairs):
                    updates[(a1, a2)] = net_out[:, idx * LB : (idx + 1) * LB]
                # Assemble [A1, A2, H, LB] by static stacking (no scatter:
                # Mosaic has no scatter lowering).
                zeros_hlb = jnp.zeros((H, LB), dt)
                rows = []
                for a1 in range(A):
                    cells = []
                    for a2 in range(A):
                        if (a1, a2) in updates:
                            cells.append(updates[(a1, a2)])
                        elif a2 == liar and self.m1_np[a1, a2]:
                            cells.append(v2_liar[a1])
                        else:
                            cells.append(zeros_hlb)
                    rows.append(jnp.stack(cells, axis=0))  # [A2, H, LB]
                val2 = jnp.stack(rows, axis=0)  # [A1, A2, H, LB]
                val2 = val2 * m1_2d
                return val_liar1, val2

            def backup(traverser, S0, S1, val_liar1, val2):
                trav_int = jnp.asarray(traverser, jnp.int32)
                lvl1_is_trav = ((player + 1) % 2 == trav_int)[None, None, :]
                q2 = jnp.swapaxes(val2, 1, 2)  # [A1, H, A2, LB]
                v1_strat = (S1 * m1e_f * q2).sum(2)
                v1_sum = val2.sum(1)
                V1 = jnp.where(lvl1_is_trav, v1_strat, v1_sum)
                liar_rows = (
                    jax.lax.broadcasted_iota(jnp.int32, (A, 1, 1), 0) == liar
                )
                V1 = jnp.where(liar_rows, val_liar1[None], V1)
                inc1 = q2 - V1[:, :, None, :]
                dR1 = jnp.where(lvl1_is_trav[None] & m1eff_b, inc1, 0.0)
                root_is_trav = (player == trav_int)[None, None, :]
                V1_t = jnp.swapaxes(V1, 0, 1)  # [H, A1, LB]
                v0_strat = (S0 * m0f[None] * V1_t).sum(1)
                v0_sum = (V1 * m0f[:, None, :]).sum(0)
                V0 = jnp.where(root_is_trav[0], v0_strat, v0_sum)
                inc0 = V1_t - V0[:, None, :]
                dR0 = jnp.where(root_is_trav & (m0f[None] > 0), inc0, 0.0)
                return V0, V1, dR0, dR1

            def cfr_iter(it, carry):
                (regrets0, sum0, last0, regrets1, sum1, last1, rvm,
                 snap0, snap1) = carry
                traverser = it % 2
                take = (it == t_stop)[None, :]  # [1, LB]
                snap0 = jnp.where(take[None], last0, snap0)
                snap1 = jnp.where(take[None, None], last1, snap1)

                val_liar1, val2 = leaf_values(traverser, last0, last1)
                V0, _, dR0, dR1 = backup(
                    traverser, last0, last1, val_liar1, val2
                )
                regrets0 = regrets0 + dR0
                regrets1 = regrets1 + dR1

                n = (it // 2).astype(dt)
                tr_is0 = traverser == 0
                alpha = (
                    2.0 / (n + 2.0) if p.linear_update else 1.0 / (n + 1.0)
                )
                tr_onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (2, 1, 1), 0)
                    == traverser
                ).astype(dt)
                rvm = rvm + tr_onehot * (V0[None] - rvm) * alpha

                num_strategies = n + 1.0
                pos_d, neg_d, strat_d = cfr_discounts(
                    p, num_strategies, dt
                )

                root_is_trav = (player == traverser)[None, None, :]
                lvl1_is_trav = ~root_is_trav
                bel_trav = jnp.where(tr_is0, bel_p0, bel_p1)

                f0 = jnp.maximum(regrets0, eps_regret) * m0f[None]
                d0 = f0.sum(1, keepdims=True)
                matched0 = f0 / jnp.where(d0 > 0, d0, 1.0)
                last0 = jnp.where(root_is_trav, matched0, last0)
                regrets0 = jnp.where(
                    root_is_trav,
                    regrets0 * jnp.where(regrets0 > 0, pos_d, neg_d),
                    regrets0,
                )
                sum0 = jnp.where(
                    root_is_trav,
                    sum0 * strat_d + bel_trav[:, None, :] * last0,
                    sum0,
                )

                f1 = jnp.maximum(regrets1, eps_regret) * m1eff_f
                d1 = f1.sum(2, keepdims=True)
                matched1 = f1 / jnp.where(d1 > 0, d1, 1.0)
                last1 = jnp.where(lvl1_is_trav[None], matched1, last1)
                regrets1 = jnp.where(
                    lvl1_is_trav[None],
                    regrets1 * jnp.where(regrets1 > 0, pos_d, neg_d),
                    regrets1,
                )
                sum1 = jnp.where(
                    lvl1_is_trav[None],
                    sum1 * strat_d + bel_trav[None, :, None, :] * last1,
                    sum1,
                )
                return (regrets0, sum0, last0, regrets1, sum1, last1, rvm,
                        snap0, snap1)

            def fp_iter(it, carry):
                (regrets0, sum0, last0, regrets1, sum1, last1, rvm,
                 snap0, snap1) = carry
                traverser = it % 2

                def navg(n0, n1):
                    nn0 = n0 * m0f[None]
                    nn1 = n1 * m1eff_f
                    dd0 = nn0.sum(1, keepdims=True)
                    dd1 = nn1.sum(2, keepdims=True)
                    return (
                        nn0 / jnp.where(dd0 > 0, dd0, 1.0),
                        nn1 / jnp.where(dd1 > 0, dd1, 1.0),
                    )

                if p.optimistic:
                    avg0, avg1 = navg(sum0 + last0, sum1 + last1)
                else:
                    avg0, avg1 = navg(sum0, sum1)

                take = (it == t_stop)[None, :]
                snap0 = jnp.where(take[None], avg0, snap0)
                snap1 = jnp.where(take[None, None], avg1, snap1)

                val_liar1, val2 = leaf_values(traverser, avg0, avg1)
                trav_int = jnp.asarray(traverser, jnp.int32)
                root_is_trav = (player == trav_int)[None, None, :]
                lvl1_is_trav = ~root_is_trav
                neg = jnp.asarray(-1e30, dt)

                q2 = jnp.swapaxes(val2, 1, 2)  # [A1, H, A2, LB]
                m1b = m1eff_b
                masked2 = jnp.where(m1b, q2, neg)
                vmax2 = masked2.max(2, keepdims=True)
                # First-occurrence one-hot via a static unrolled scan over the
                # (tiny) action axis in f32 arithmetic — Mosaic has no cumsum
                # lowering and dislikes stacked bool vectors.
                eqf = jnp.where((masked2 == vmax2) & m1b, 1.0, 0.0)
                taken = jnp.zeros_like(eqf[:, :, 0, :])
                firsts = []
                for a in range(A):
                    cur = eqf[:, :, a, :] * (1.0 - taken)
                    firsts.append(cur)
                    taken = taken + cur
                br1 = jnp.stack(firsts, axis=2)
                has1 = m1b.any(2)
                v1_max = jnp.where(has1, vmax2[:, :, 0, :], 0.0)
                v1_sum = val2.sum(1)
                V1 = jnp.where(lvl1_is_trav, v1_max, v1_sum)
                liar_rows = (
                    jax.lax.broadcasted_iota(jnp.int32, (A, 1, 1), 0) == liar
                )
                V1 = jnp.where(liar_rows, val_liar1[None], V1)

                V1_t = jnp.swapaxes(V1, 0, 1)
                m0b = m0f[None] > 0
                masked0 = jnp.where(m0b, V1_t, neg)
                vmax0 = masked0.max(1, keepdims=True)
                eqf0 = jnp.where((masked0 == vmax0) & m0b, 1.0, 0.0)
                taken0 = jnp.zeros_like(eqf0[:, 0, :])
                firsts0 = []
                for a in range(A):
                    cur = eqf0[:, a, :] * (1.0 - taken0)
                    firsts0.append(cur)
                    taken0 = taken0 + cur
                br0 = jnp.stack(firsts0, axis=1)
                v0_sum = (V1 * m0f[:, None, :]).sum(0)
                V0 = jnp.where(root_is_trav[0], vmax0[:, 0, :], v0_sum)

                num_update = (it // 2 + 1).astype(dt)
                alpha = (
                    2.0 / (num_update + 1.0)
                    if p.linear_update
                    else 1.0 / num_update
                )
                tr_onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (2, 1, 1), 0)
                    == traverser
                ).astype(dt)
                rvm = rvm + tr_onehot * (V0[None] - rvm) * alpha

                decay = (
                    (num_update + 1.0) / (num_update + 2.0)
                    if p.linear_update
                    else jnp.asarray(1.0, dt)
                )
                bel_trav = jnp.where(traverser == 0, bel_p0, bel_p1)
                w0 = bel_trav[:, None, :] * br0
                sum0 = jnp.where(root_is_trav, (sum0 + w0) * decay, sum0)
                last0 = jnp.where(root_is_trav, w0, last0)
                w1 = bel_trav[None, :, None, :] * br1
                sum1 = jnp.where(
                    lvl1_is_trav[None], (sum1 + w1) * decay, sum1
                )
                last1 = jnp.where(lvl1_is_trav[None], w1, last1)
                return (regrets0, sum0, last0, regrets1, sum1, last1, rvm,
                        snap0, snap1)

            init = (
                jnp.zeros((H, A, LB), dt),
                u0 * bel_root[:, None, :],
                u0,
                jnp.zeros((A, H, A, LB), dt),
                u1 * bel_lvl1[None, :, None, :],
                u1,
                jnp.zeros((2, H, LB), dt),
                u0,  # snap0 at t=0 is the uniform sampling strategy
                u1,
            )

            def cfr_leaf(it, carry):
                # Pipeline phase 1: leaf values for the current last
                # strategies (cfr_iter's leaf_values call, hoisted).
                return leaf_values(it % 2, carry[2], carry[5])

            def cfr_update(it, carry, vals):
                # Pipeline phase 2 — KEEP IN SYNC with cfr_iter above
                # (which stays verbatim so the nsub == 1 trace, the
                # shipped default, is byte-identical).
                (regrets0, sum0, last0, regrets1, sum1, last1, rvm,
                 snap0, snap1) = carry
                val_liar1, val2 = vals
                traverser = it % 2
                take = (it == t_stop)[None, :]  # [1, LB]
                snap0 = jnp.where(take[None], last0, snap0)
                snap1 = jnp.where(take[None, None], last1, snap1)

                V0, _, dR0, dR1 = backup(
                    traverser, last0, last1, val_liar1, val2
                )
                regrets0 = regrets0 + dR0
                regrets1 = regrets1 + dR1

                n = (it // 2).astype(dt)
                tr_is0 = traverser == 0
                alpha = (
                    2.0 / (n + 2.0) if p.linear_update else 1.0 / (n + 1.0)
                )
                tr_onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (2, 1, 1), 0)
                    == traverser
                ).astype(dt)
                rvm = rvm + tr_onehot * (V0[None] - rvm) * alpha

                num_strategies = n + 1.0
                pos_d, neg_d, strat_d = cfr_discounts(
                    p, num_strategies, dt
                )

                root_is_trav = (player == traverser)[None, None, :]
                lvl1_is_trav = ~root_is_trav
                bel_trav = jnp.where(tr_is0, bel_p0, bel_p1)

                f0 = jnp.maximum(regrets0, eps_regret) * m0f[None]
                d0 = f0.sum(1, keepdims=True)
                matched0 = f0 / jnp.where(d0 > 0, d0, 1.0)
                last0 = jnp.where(root_is_trav, matched0, last0)
                regrets0 = jnp.where(
                    root_is_trav,
                    regrets0 * jnp.where(regrets0 > 0, pos_d, neg_d),
                    regrets0,
                )
                sum0 = jnp.where(
                    root_is_trav,
                    sum0 * strat_d + bel_trav[:, None, :] * last0,
                    sum0,
                )

                f1 = jnp.maximum(regrets1, eps_regret) * m1eff_f
                d1 = f1.sum(2, keepdims=True)
                matched1 = f1 / jnp.where(d1 > 0, d1, 1.0)
                last1 = jnp.where(lvl1_is_trav[None], matched1, last1)
                regrets1 = jnp.where(
                    lvl1_is_trav[None],
                    regrets1 * jnp.where(regrets1 > 0, pos_d, neg_d),
                    regrets1,
                )
                sum1 = jnp.where(
                    lvl1_is_trav[None],
                    sum1 * strat_d + bel_trav[None, :, None, :] * last1,
                    sum1,
                )
                return (regrets0, sum0, last0, regrets1, sum1, last1, rvm,
                        snap0, snap1)

            def finalize(out):
                (regrets0, sum0, last0, regrets1, sum1, last1, rvm, snap0,
                 snap1) = out
                # Final snapshot when t == num_iters.
                if p.use_cfr:
                    fin0, fin1 = last0, last1
                else:
                    n0 = (sum0 + (last0 if p.optimistic else 0.0)) * m0f[None]
                    n1 = (sum1 + (last1 if p.optimistic else 0.0)) * m1eff_f
                    d0 = n0.sum(1, keepdims=True)
                    d1 = n1.sum(2, keepdims=True)
                    fin0 = n0 / jnp.where(d0 > 0, d0, 1.0)
                    fin1 = n1 / jnp.where(d1 > 0, d1, 1.0)
                take = (t_stop == p.num_iters)[None, :]
                snap0 = jnp.where(take[None], fin0, snap0)
                snap1 = jnp.where(take[None, None], fin1, snap1)

                store(rvm_ref, rvm)
                store(snap0_ref, snap0)
                store(snap1_ref, snap1)

            return init, cfr_iter, fp_iter, cfr_leaf, cfr_update, finalize

        if nsub == 1:
            init, cfr_iter, fp_iter, _, _, finalize = make_block(0)
            body = cfr_iter if p.use_cfr else fp_iter
            out = jax.lax.fori_loop(0, p.num_iters, body, init)
            finalize(out)
        else:
            assert nsub == 2, "interleave > 2 not implemented"
            initA, _, _, leafA, updateA, finA = make_block(0)
            initB, _, _, leafB, updateB, finB = make_block(FULL_LB // 2)
            valsA = leafA(0, initA)

            def body(it, carry):
                stA, stB, vA = carry
                # Software pipeline: each block's MXU-heavy leaf pass is
                # adjacent to the other block's independent VPU update.
                vB = leafB(it, stB)
                stA = updateA(it, stA, vA)
                vA = leafA(it + 1, stA)  # one wasted pass at it = N-1
                stB = updateB(it, stB, vB)
                return (stA, stB, vA)

            stA, stB, _ = jax.lax.fori_loop(
                0, p.num_iters, body, (initA, initB, valsA)
            )
            finA(stA)
            finB(stB)


    # ---------------------------------------------------------------- API
    def solve(self, bids, players, beliefs, t_stop, net_params=None):
        """bids/players/t_stop [B] i32, beliefs [B, 2, H] -> outputs with
        leading batch dim."""
        game = self.game
        A, H = game.num_actions, game.num_hands
        LB = self.lane_block
        B = bids.shape[0]
        assert B % LB == 0, (B, LB)
        grid = B // LB

        # Flatten net params into a fixed-order leaf list.
        leaves = []
        net_layout = []  # True per hidden layer with LayerNorm leaves
        if net_params is not None:
            pp = net_params["params"]
            k = 0
            while f"Dense_{k}" in pp:
                d = pp[f"Dense_{k}"]
                is_head = f"Dense_{k + 1}" not in pp
                leaves.append(d["kernel"])
                leaves.append(d["bias"])
                if not is_head:
                    has_ln = f"LayerNorm_{k}" in pp
                    net_layout.append(has_ln)
                    if has_ln:
                        ln = pp[f"LayerNorm_{k}"]
                        leaves.append(ln["scale"])
                        leaves.append(ln["bias"])
                k += 1
        n_net = len(leaves)
        net_layout = tuple(net_layout)

        bel_bl = jnp.moveaxis(
            jnp.asarray(beliefs, jnp.float32), 0, -1
        )  # [2, H, B]

        def kernel(*refs):
            net_refs = refs[:n_net]
            (matches_ref, payoff_ref, bel_ref, bid_ref,
             player_ref, t_ref, rvm_ref, snap0_ref, snap1_ref) = refs[n_net:]
            self._kernel(
                list(net_refs), net_layout, matches_ref, payoff_ref,
                bel_ref, bid_ref, player_ref, t_ref,
                rvm_ref, snap0_ref, snap1_ref,
            )

        lane_spec = lambda *shape: pl.BlockSpec(
            shape + (LB,),
            lambda i: tuple([0] * len(shape)) + (i,),
            memory_space=pltpu.VMEM,
        )
        full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

        rvm, snap0, snap1 = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[full_spec] * (n_net + 2)
            + [
                lane_spec(2, H),
                lane_spec(1),
                lane_spec(1),
                lane_spec(1),
            ],
            out_specs=(
                lane_spec(2, H),
                lane_spec(H, A),
                lane_spec(A, H, A),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((2, H, B), jnp.float32),
                jax.ShapeDtypeStruct((H, A, B), jnp.float32),
                jax.ShapeDtypeStruct((A, H, A, B), jnp.float32),
            ),
            # The default scoped-vmem limit is 16 MiB; v5e has 128 MiB
            # of physical VMEM.  The fused loop keeps solver state,
            # hoisted masks, net weights and MLP activations resident,
            # so raise the cap (also unlocks lane_block > 128).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=self.interpret,
        )(
            *leaves,
            jnp.asarray(game.matches_table, jnp.float32),
            jnp.concatenate(
                [
                    jnp.asarray(game.terminal_payoff, jnp.float32),
                    jnp.zeros((1, H, H), jnp.float32),
                ],
                axis=0,
            ),
            bel_bl,
            jnp.asarray(bids, jnp.int32)[None, :],
            jnp.asarray(players, jnp.int32)[None, :],
            jnp.asarray(t_stop, jnp.int32)[None, :],
        )
        return Grid2PallasOutputs(
            rvm=jnp.moveaxis(rvm, -1, 0),
            snap0=jnp.moveaxis(snap0, -1, 0),
            snap1=jnp.moveaxis(snap1, -1, 0),
        )
