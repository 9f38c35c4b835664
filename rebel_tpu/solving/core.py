"""Shared tensor machinery for subgame solving.

TPU-first re-design of ``PartialTreeTraverser``
(/root/reference/csrc/liars_dice/subgame_solving.cc:152-303): reach
propagation, terminal values and value-net leaf evaluation as dense masked
array programs over ``[num_nodes, num_hands(, num_actions)]`` tensors.
Everything here is pure and shape-static, so it jits once per tree topology
and vmaps over batches of subgames that differ only in their root context
(root bid / player / action mask) and beliefs.

Key differences from the reference:

* The reference walks nodes in scalar loops per iteration; here each tree
  *depth level* is one gather/scatter over a contiguous node slice (BFS
  order guarantees contiguity), and the per-level loop unrolls at trace
  time.
* A node's actor is derived from depth parity + a (possibly traced) root
  player, so one compiled program covers subgames rooted at either player.
* Invalid nodes (masked-out when a supertree is restricted to a concrete
  root) carry zero reach and masked strategies, so they contribute nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.tree import NO_CHILD, TreeSpec

# Reach / regret smoothing constants (subgame_solving.h:33-36).  The
# reference uses 1e-80 in double precision; for the float32 fast path we
# use the largest epsilon that is still negligible relative to real
# probability mass yet stays clear of the float32 denormal range.
REACH_EPS_F64 = 1e-80
REGRET_EPS_F64 = 1e-80
REACH_EPS_F32 = 1e-30
REGRET_EPS_F32 = 1e-30


def reach_eps(dtype) -> float:
    """NB: when x64 is disabled jax silently truncates f64 arrays to
    f32; resolve the eps from the dtype jax will actually use."""
    dt = jnp.zeros((), dtype).dtype  # canonicalized
    return REACH_EPS_F64 if jnp.dtype(dt).itemsize == 8 else REACH_EPS_F32


def regret_eps(dtype) -> float:
    dt = jnp.zeros((), dtype).dtype  # canonicalized
    return REGRET_EPS_F64 if jnp.dtype(dt).itemsize == 8 else REGRET_EPS_F32


# A value-net: maps a query batch [L, query_size] -> values [L, num_hands].
ValueFn = Callable[[jnp.ndarray], jnp.ndarray]


class RootCtx(NamedTuple):
    """Runtime root context restricting a (super)tree to a concrete subgame.

    All fields may be traced scalars/arrays, so a batch of subgames with
    different roots vmaps over this structure.
    """

    bid: jnp.ndarray  # i32 scalar: last bid before the root (-1 = initial)
    player: jnp.ndarray  # i32 scalar: actor at the root
    mask: jnp.ndarray  # [A] bool: legal root actions

    @staticmethod
    def concrete(tree: TreeSpec) -> "RootCtx":
        """Static root context of a concretely-rooted tree."""
        assert not tree.is_supertree
        return RootCtx(
            bid=jnp.int32(tree.root_bid),
            player=jnp.int32(tree.root_player),
            mask=jnp.asarray(tree.action_mask[0]),
        )

    @staticmethod
    def of(game: LiarsDice, bid, player) -> "RootCtx":
        from rebel_tpu.tree import root_action_mask

        bid = jnp.asarray(bid, jnp.int32)
        return RootCtx(
            bid=bid,
            player=jnp.asarray(player, jnp.int32),
            mask=root_action_mask(game, bid),
        )


def normalize(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Masked probability normalization (util.h:24-46), zero-safe: rows with
    no mass (e.g. masked-out nodes) normalize to zero instead of NaN."""
    x = jnp.where(mask, x, 0)
    s = x.sum(axis=axis, keepdims=True)
    return x / jnp.where(s > 0, s, 1)


def normalize_safe(x: jnp.ndarray, eps: float, axis: int = -1) -> jnp.ndarray:
    """Epsilon-smoothed normalization (util.h:68-85): adds ``eps`` to every
    entry before normalizing, so all-zero inputs become uniform."""
    x = x + eps
    return x / x.sum(axis=axis, keepdims=True)


def root_query(game, dtype, beliefs, traverser, bid, player) -> jnp.ndarray:
    """[query_size] value-net query for a public state
    (subgame_solving.cc:100-123) — the SINGLE jit-traceable builder of
    the training interchange layout, shared by SolverContext and the
    self-play engines (the host-side encoders live in
    solving/queries.py and selfplay/replicate.py)."""
    eps = reach_eps(dtype)
    onehot = (jnp.arange(game.num_actions) == bid).astype(dtype)
    return jnp.concatenate(
        [
            jnp.asarray(player, dtype)[None],
            jnp.asarray(traverser, dtype)[None],
            onehot,
            normalize_safe(beliefs[0].astype(dtype), eps),
            normalize_safe(beliefs[1].astype(dtype), eps),
        ]
    )


def cfr_discounts(p, num_strategies, dtype):
    """``(pos_d, neg_d, strat_d)`` regret/average-strategy discounts for
    one CFR update — linear CFR or DCFR with the alpha>=5 / beta<=-5
    clamps (subgame_solving.cc:592-617).  Single source of truth for
    every engine (generic, grid2, grid2b, the pallas kernel)."""
    one = jnp.asarray(1.0, dtype)
    if p.linear_update:
        d = num_strategies / (num_strategies + 1)
        return d, d, d
    if p.dcfr:
        if p.dcfr_alpha >= 5:
            pos_d = one
        else:
            na = num_strategies**p.dcfr_alpha
            pos_d = na / (na + 1.0)
        if p.dcfr_beta <= -5:
            neg_d = jnp.asarray(0.0, dtype)
        else:
            nb = num_strategies**p.dcfr_beta
            neg_d = nb / (nb + 1.0)
        strat_d = (num_strategies / (num_strategies + 1)) ** p.dcfr_gamma
        return pos_d, neg_d, strat_d
    return one, one, one


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: jit-static
class SolverContext:
    """Per-(game, tree, dtype) constants baked into solver programs."""

    game: LiarsDice
    tree: TreeSpec
    dtype: jnp.dtype = jnp.float32
    # Reference-parity mode: round win probabilities through float32 like
    # the reference does (`const float prob_to_win`,
    # subgame_solving.cc:785).  Only meaningful with dtype=float64.
    terminal_f32_parity: bool = False

    # ----------------------------------------------------------- properties
    @property
    def N(self) -> int:
        return self.tree.num_nodes

    @property
    def A(self) -> int:
        return self.game.num_actions

    @property
    def H(self) -> int:
        return self.game.num_hands

    def __post_init__(self):
        # Precompute numpy constants (captured by closure into XLA).
        t = self.tree
        object.__setattr__(self, "_child_clamped", np.maximum(t.child_index, 0))
        object.__setattr__(self, "_interior", t.num_children > 0)

    # --------------------------------------------------------------- masks
    def node_valid(self, root: RootCtx) -> jnp.ndarray:
        """[N] bool — nodes reachable under the root's legal actions."""
        t = self.tree
        is_root = np.arange(self.N) == 0
        return jnp.where(
            jnp.asarray(is_root), True, root.mask[jnp.asarray(t.anc1_action)]
        )

    def action_masks(self, root: RootCtx) -> jnp.ndarray:
        """[N, A] bool — legal actions per node under this root."""
        t = self.tree
        valid = self.node_valid(root)
        amask = jnp.asarray(t.action_mask) & valid[:, None]
        is_root_row = jnp.asarray((np.arange(self.N) == 0)[:, None])
        return jnp.where(is_root_row, root.mask[None, :], amask)

    def node_player(self, depth, root: RootCtx) -> jnp.ndarray:
        """Actor at depth ``depth`` (players alternate from the root)."""
        return (root.player + jnp.asarray(depth)) % 2

    # ------------------------------------------------------------ strategy
    def uniform_strategy(self, amask: jnp.ndarray) -> jnp.ndarray:
        """[N, H, A] uniform over legal actions (subgame_solving.cc:718-730)."""
        u = normalize(amask.astype(self.dtype), amask)
        return jnp.broadcast_to(u[:, None, :], (self.N, self.H, self.A))

    # -------------------------------------------------------------- reaches
    def compute_reaches(
        self,
        strategy: jnp.ndarray,  # [N, H, A]
        beliefs_p: jnp.ndarray,  # [H]
        player,  # i32 scalar
        root: RootCtx,
    ) -> jnp.ndarray:
        """[N, H] — P(root->node, hand) for ``player``
        (subgame_solving.cc:54-78): descending the tree, multiply by the
        acting player's strategy on edges they own; copy otherwise."""
        t = self.tree
        reach = jnp.zeros((self.N, self.H), self.dtype)
        reach = reach.at[0].set(beliefs_p.astype(self.dtype))
        for d, (ls, le) in enumerate(t.level_slices):
            if d == 0:
                continue
            par = t.parent[ls:le]  # np const
            bid = t.last_bid[ls:le]  # np const
            pr = reach[jnp.asarray(par)]  # [n, H]
            w = strategy[jnp.asarray(par), :, jnp.asarray(bid)]  # [n, H]
            parent_is_player = self.node_player(d - 1, root) == player
            reach = reach.at[ls:le].set(jnp.where(parent_is_player, pr * w, pr))
        return reach

    # -------------------------------------------------------- leaf values
    def terminal_values(
        self,
        opp_reach: jnp.ndarray,  # [N, H] reaches of player 1-traverser
        traverser,  # i32 scalar
        root: RootCtx,
    ) -> jnp.ndarray:
        """[T, H] traverser values at the static terminal set
        (subgame_solving.cc:80-98, 765-789).

        Algorithm mirrors ``compute_win_probability``: bucket the
        opponent's reach mass by match count (one small matmul), suffix-sum
        the buckets, and look up ``quantity - own_matches`` — O(H * D)
        per terminal instead of the naive O(H^2) pairing.  Payoff is
        ``2 * P(win) - sum(op_reach)``, sign-flipped when the traverser is
        the liar-caller."""
        game, t = self.game, self.tree
        tids = t.terminal_ids
        if tids.size == 0:
            return jnp.zeros((0, self.H), self.dtype)
        D = game.total_num_dice
        # The challenged bid is the terminal's parent's last bid; for a
        # liar call directly below a (super)tree root, that is the
        # *runtime* root bid, not the static tree constant.
        bids = jnp.where(
            jnp.asarray(t.depth[tids] == 1),
            root.bid,
            jnp.asarray(t.challenged_bid[tids]),
        )  # [T]
        faces = bids % game.num_faces
        quantities = 1 + bids // game.num_faces
        m = jnp.asarray(game.matches_table)  # [H, F]
        own_matches = m.T[faces]  # [T, H]
        # One-hot bucket matrix per terminal: [T, H, D+1].
        bucket_onehot = (
            own_matches[:, :, None] == jnp.arange(D + 1)[None, None, :]
        ).astype(self.dtype)
        r = opp_reach[jnp.asarray(tids)]  # [T, H]
        buckets = jnp.einsum("to,toj->tj", r, bucket_onehot)  # [T, D+1]
        cum = jnp.cumsum(buckets[:, ::-1], axis=-1)[:, ::-1]  # suffix sums
        left_to_win = jnp.clip(quantities[:, None] - own_matches, 0, D)
        p_win = jnp.take_along_axis(cum, left_to_win, axis=-1)
        if self.terminal_f32_parity:
            p_win = p_win.astype(jnp.float32).astype(self.dtype)
        v = p_win * 2 - r.sum(-1, keepdims=True)
        term_player = self.node_player(t.depth[tids], root)
        sign = jnp.where(term_player == traverser, 1.0, -1.0).astype(self.dtype)
        return v * sign[:, None]

    def leaf_queries(
        self,
        reach0: jnp.ndarray,  # [N, H]
        reach1: jnp.ndarray,  # [N, H]
        traverser,  # i32 scalar
        root: RootCtx,
    ) -> jnp.ndarray:
        """[L, query_size] value-net queries at the static pseudo-leaf set.

        Query layout must match the reference exactly
        (subgame_solving.cc:104-123): ``[node_player, traverser,
        one_hot(last_bid), normalize_safe(reach0), normalize_safe(reach1)]``.
        """
        t = self.tree
        pids = t.pseudo_leaf_ids
        L = pids.size
        dt = self.dtype
        player = self.node_player(t.depth[pids], root).astype(dt)[:, None]
        trav = jnp.full((L, 1), 0, dt) + jnp.asarray(traverser, dt)
        onehot = jnp.asarray(
            np.arange(self.A)[None, :] == t.last_bid[pids][:, None], dt
        )
        eps = reach_eps(dt)
        b0 = normalize_safe(reach0[jnp.asarray(pids)].astype(dt), eps)
        b1 = normalize_safe(reach1[jnp.asarray(pids)].astype(dt), eps)
        return jnp.concatenate([player, trav, onehot, b0, b1], axis=-1)

    def root_query(
        self,
        beliefs: jnp.ndarray,  # [2, H]
        traverser,
        root: RootCtx,
    ) -> jnp.ndarray:
        """[query_size] — the training-example query at the subgame root
        (subgame_solving.cc:212-226)."""
        return root_query(
            self.game, self.dtype, beliefs, traverser, root.bid,
            root.player,
        )

    def all_leaf_values(
        self,
        reach0: jnp.ndarray,
        reach1: jnp.ndarray,
        traverser,
        root: RootCtx,
        value_fn: ValueFn | None,
    ) -> jnp.ndarray:
        """[N, H] with terminal + pseudo-leaf values filled, zeros elsewhere
        (subgame_solving.cc:238-293).  Pseudo-leaf net values are scaled by
        the opponent's total reach mass to restore counterfactual magnitude
        (subgame_solving.cc:253-269)."""
        t = self.tree
        values = jnp.zeros((self.N, self.H), self.dtype)

        opp_reach = jnp.where(jnp.asarray(traverser) == 0, reach1, reach0)
        tv = self.terminal_values(opp_reach, traverser, root)
        if t.terminal_ids.size:
            values = values.at[jnp.asarray(t.terminal_ids)].set(tv)

        pids = t.pseudo_leaf_ids
        if pids.size:
            if value_fn is None:
                raise ValueError(
                    "tree has non-terminal leaves but no value net; either "
                    "provide value_fn or increase max_depth "
                    "(subgame_solving.cc:177-186)"
                )
            queries = self.leaf_queries(reach0, reach1, traverser, root)
            net_vals = value_fn(queries).astype(self.dtype)  # [L, H]
            scale = opp_reach[jnp.asarray(pids)].sum(-1, keepdims=True)
            values = values.at[jnp.asarray(pids)].set(net_vals * scale)
        return values

    # --------------------------------------------------------------- backup
    def gather_child_values(
        self, values: jnp.ndarray, ls: int, le: int
    ) -> jnp.ndarray:
        """[n, A, H] child values for the node slice; garbage where no
        child (callers mask)."""
        ci = self._child_clamped[ls:le]  # np const
        return values[jnp.asarray(ci)]  # [n, A, H]

    def backup_expected(
        self,
        leaf_values: jnp.ndarray,  # [N, H]
        strategy: jnp.ndarray,  # [N, H, A]
        traverser,
        root: RootCtx,
        amask: jnp.ndarray,
        with_regrets: bool = False,
    ):
        """Bottom-up expected-value pass of ``last_strategies`` for the
        traverser (CFR::update_regrets, subgame_solving.cc:538-575).

        At traverser nodes ``V = sum_a pi(a) Q(a)``; at opponent nodes the
        opponent's reach already weights the children so ``V = sum_a Q(a)``.
        Returns ``values [N, H]`` and, if requested, the per-action regret
        increments ``q_minus_v [N, H, A]`` (zero outside traverser rows).
        """
        t = self.tree
        values = leaf_values
        q_minus_v = (
            jnp.zeros((self.N, self.H, self.A), self.dtype)
            if with_regrets
            else None
        )
        for d in reversed(range(len(t.level_slices) - 1)):
            ls, le = t.level_slices[d]
            interior = self._interior[ls:le]
            if not interior.any():
                continue
            cvals = self.gather_child_values(values, ls, le)  # [n, A, H]
            m = amask[ls:le]  # [n, A]
            cvals = jnp.where(m[:, :, None], cvals, 0)
            strat = strategy[ls:le]  # [n, H, A]
            v_trav = jnp.einsum("nha,nah->nh", strat, cvals)
            v_opp = cvals.sum(axis=1)  # [n, H]
            actor_is_trav = self.node_player(d, root) == traverser
            v = jnp.where(actor_is_trav, v_trav, v_opp)
            keep = jnp.asarray(t.is_leaf[ls:le])[:, None]
            values = values.at[ls:le].set(
                jnp.where(keep, values[ls:le], v)
            )
            if with_regrets:
                q = jnp.swapaxes(cvals, 1, 2)  # [n, H, A]
                inc = jnp.where(
                    actor_is_trav & ~keep[..., None],
                    jnp.where(m[:, None, :], q - v[:, :, None], 0),
                    0,
                )
                q_minus_v = q_minus_v.at[ls:le].set(inc)
        return (values, q_minus_v) if with_regrets else values

    def backup_best_response(
        self,
        leaf_values: jnp.ndarray,  # [N, H]
        traverser,
        root: RootCtx,
        amask: jnp.ndarray,
    ):
        """Bottom-up best-response pass (BRSolver::compute_br,
        subgame_solving.cc:316-358): traverser maximizes per-hand over
        children (earliest argmax on ties, matching the reference's strict
        ``>`` update); opponent nodes sum.  Returns ``(values [N, H],
        br_strategy [N, H, A])`` where br rows are one-hot at traverser
        interior nodes and zero elsewhere."""
        t = self.tree
        values = leaf_values
        br = jnp.zeros((self.N, self.H, self.A), self.dtype)
        neg = jnp.asarray(-jnp.inf, self.dtype)
        for d in reversed(range(len(t.level_slices) - 1)):
            ls, le = t.level_slices[d]
            interior = self._interior[ls:le]
            if not interior.any():
                continue
            cvals = self.gather_child_values(values, ls, le)  # [n, A, H]
            m = amask[ls:le]  # [n, A]
            masked = jnp.where(m[:, :, None], cvals, neg)
            v_max = masked.max(axis=1)  # [n, H]
            best = masked.argmax(axis=1)  # [n, H] first max == reference
            v_sum = jnp.where(m[:, :, None], cvals, 0).sum(axis=1)
            actor_is_trav = self.node_player(d, root) == traverser
            v = jnp.where(actor_is_trav, v_max, v_sum)
            keep = jnp.asarray(t.is_leaf[ls:le])[:, None]
            values = values.at[ls:le].set(jnp.where(keep, values[ls:le], v))
            onehot = jax.nn.one_hot(best, self.A, dtype=self.dtype)  # [n,H,A]
            row_ok = (
                actor_is_trav
                & ~keep[..., None]
                & (m.any(axis=-1)[:, None, None])
            )
            br = br.at[ls:le].set(jnp.where(row_ok, onehot, 0))
        return values, br
