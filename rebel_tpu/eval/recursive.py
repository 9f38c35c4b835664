"""Recursive (nested) subgame solving over the full game tree.

Re-design of the reference's recursive strategy builders
(/root/reference/csrc/liars_dice/recursive_solving.cc:47-156, 277-327)
used by evaluation: the reference recurses node-by-node, building a fresh
C++ solver per subgame.  Here all subgames share one masked supertree
topology, so each *frontier* of the recursion is solved as a single
vmapped batch on device; only the tree bookkeeping stays on host.

Per-subgame random stop iterations (the training-time emulation used by
``compute_sampled_strategy_recursive_to_leaf``,
recursive_solving.cc:301-327) are realized by running the full iteration
scan and snapshotting each lane's strategies at its own ``t`` — identical
results to stopping at ``t``, with no shape raggedness.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import INITIAL_ACTION, LiarsDice
from rebel_tpu.solving.core import RootCtx, SolverContext, ValueFn, reach_eps
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.solver import build_solver
from rebel_tpu.tree import NO_CHILD, TreeSpec, build_supertree, unroll_tree


def _normalize_safe_np(x: np.ndarray, eps: float) -> np.ndarray:
    x = x + eps
    return x / x.sum(-1, keepdims=True)


@dataclasses.dataclass(frozen=True, eq=False)
class BatchSubgameSolver:
    """Jitted, vmapped ``multistep`` with per-lane stop-iteration
    snapshots on a shared supertree."""

    game: LiarsDice
    params: SubgameSolvingParams
    dtype: jnp.dtype = jnp.float64
    value_fn: ValueFn | None = None
    max_depth: int | None = None  # default: params.max_depth

    def __post_init__(self):
        depth = self.params.max_depth if self.max_depth is None else self.max_depth
        depth = min(depth, self.game.max_depth)
        tree = build_supertree(self.game, depth)
        ctx = SolverContext(game=self.game, tree=tree, dtype=self.dtype)
        solver = build_solver(ctx, self.params, self.value_fn)
        object.__setattr__(self, "ctx", ctx)
        object.__setattr__(self, "tree", tree)
        object.__setattr__(self, "solver", solver)

        def solve_one(bid, player, beliefs, t):
            root = RootCtx.of(self.game, bid, player)
            state = solver.init(root, beliefs)
            snap_avg = solver.average_strategy(state, root)
            snap_samp = solver.sampling_strategy(state)

            def body(carry, it):
                st, sa, ss = carry
                take = it == t
                sa = jnp.where(take, solver.average_strategy(st, root), sa)
                ss = jnp.where(take, solver.sampling_strategy(st), ss)
                st = solver.step(st, it % 2, root)
                return (st, sa, ss), None

            (state, snap_avg, snap_samp), _ = jax.lax.scan(
                body, (state, snap_avg, snap_samp),
                jnp.arange(self.params.num_iters),
            )
            done = t == self.params.num_iters
            snap_avg = jnp.where(
                done, solver.average_strategy(state, root), snap_avg
            )
            snap_samp = jnp.where(
                done, solver.sampling_strategy(state), snap_samp
            )
            # Reaches under BOTH candidate belief-propagation strategies
            # (recursive_solving.cc:96-102): the sampled mode propagates
            # with get_belief_propogation_strategy (== the sampling
            # strategy for both solver types), the non-sampled mode with
            # the AVERAGE strategy — for CFR those differ.
            r_samp = jnp.stack([
                ctx.compute_reaches(snap_samp, beliefs[0], 0, root),
                ctx.compute_reaches(snap_samp, beliefs[1], 1, root),
            ])
            r_avg = jnp.stack([
                ctx.compute_reaches(snap_avg, beliefs[0], 0, root),
                ctx.compute_reaches(snap_avg, beliefs[1], 1, root),
            ])
            return snap_avg, snap_samp, r_samp, r_avg

        self_jit = jax.jit(jax.vmap(solve_one))
        object.__setattr__(self, "_solve", self_jit)

    def solve(self, bids, players, beliefs, stop_iters=None, chunk: int = 256):
        """bids/players [B], beliefs [B, 2, H], stop_iters [B] (None =
        full solve).  Returns (avg [B,N,H,A], sampling [B,N,H,A],
        reaches_sampling [B,2,N,H], reaches_avg [B,2,N,H]).  Solved in
        power-of-2 padded chunks so the compiled shape set is bounded."""
        B = int(np.shape(bids)[0])
        if stop_iters is None:
            stop_iters = np.full((B,), self.params.num_iters, np.int32)
        bids = np.asarray(bids, np.int32)
        players = np.asarray(players, np.int32)
        beliefs = np.asarray(beliefs)
        stop_iters = np.asarray(stop_iters, np.int32)

        outs = []
        for lo in range(0, B, chunk):
            hi = min(lo + chunk, B)
            # Pad to the next power of two (NOT clamped to B): frontier
            # sizes vary per recursion level, and compiling one program
            # per exact size dominates eval wall-clock on TPU.
            size = 1 << (hi - lo - 1).bit_length()
            pad = size - (hi - lo)
            sl = slice(lo, hi)
            pad_rows = lambda x: np.concatenate(
                [x[sl]] + ([x[lo : lo + 1]] * pad if pad else []), axis=0
            )
            out = self._solve(
                jnp.asarray(pad_rows(bids)),
                jnp.asarray(pad_rows(players)),
                jnp.asarray(pad_rows(beliefs), self.dtype),
                jnp.asarray(pad_rows(stop_iters)),
            )
            outs.append(jax.tree.map(lambda x: np.asarray(x)[: hi - lo], out))
        return tuple(
            np.concatenate([o[k] for o in outs], axis=0) for k in range(4)
        )


def stop_iteration_weights(num_iters: int) -> np.ndarray:
    """Linear weights over even stop iterations (emulating training-time
    behavior, recursive_solving.cc:305-318) — single source for the
    sequential and batched sampled evals (their draw-for-draw parity is
    pinned by tests/test_recursive.py)."""
    return np.array(
        [0.0 if i % 2 else i / 2.0 + 1 for i in range(num_iters)]
    )


def _map_supertree_to_full(
    sup: TreeSpec, full: TreeSpec, full_root: int
) -> np.ndarray:
    """For a subgame rooted at full-tree node ``full_root``, map each
    supertree node id to the corresponding full-tree node id (NO_CHILD for
    invalid/unreachable).  Mirrors the BFS index correspondence the
    reference relies on (recursive_solving.cc:104-125) but across our two
    static topologies, matching child-by-child on action ids."""
    m = np.full(sup.num_nodes, NO_CHILD, np.int64)
    m[0] = full_root
    for s in range(1, sup.num_nodes):
        p = m[sup.parent[s]]
        if p == NO_CHILD:
            continue
        a = sup.last_bid[s]
        m[s] = full.child_index[p, a]
    return m


def _solve_frontier(
    bsolver: BatchSubgameSolver,
    frontier: list[tuple[int, np.ndarray]],
    full: TreeSpec,
    rng: np.random.RandomState | None,
    iteration_weights: np.ndarray | None,
):
    """Solve a frontier of subgames in one padded vmapped batch."""
    game = bsolver.game
    B = len(frontier)
    bids = np.array([full.last_bid[n] for n, _ in frontier], np.int32)
    players = np.array(
        [full.node_player(n) for n, _ in frontier], np.int32
    )
    beliefs = np.stack([b for _, b in frontier])
    if iteration_weights is not None:
        # Per-subgame stop iteration with linear weights over even
        # iterations (recursive_solving.cc:305-318).
        p = iteration_weights / iteration_weights.sum()
        stops = rng.choice(len(iteration_weights), size=B, p=p).astype(np.int32)
    else:
        stops = None
    return bids, players, bsolver.solve(bids, players, beliefs, stops)


def compute_strategy_recursive(
    game: LiarsDice,
    params: SubgameSolvingParams,
    value_fn: ValueFn | None = None,
    dtype=jnp.float64,
) -> np.ndarray:
    """Root-policy-only recursion (compute_strategy_recursive,
    recursive_solving.cc:47-74): every non-terminal full-tree node gets the
    root policy of a fresh subgame solved at that node; children recurse
    with Bayes-updated beliefs.  Returns [N_full, H, A]."""
    full = unroll_tree(game)
    bsolver = BatchSubgameSolver(game, params, dtype, value_fn)
    eps = reach_eps(dtype)
    H, A = game.num_hands, game.num_actions
    strategy = np.zeros((full.num_nodes, H, A))

    frontier = [(0, np.full((2, H), 1.0 / H))]
    while frontier:
        frontier = [
            (n, b) for n, b in frontier if not full.is_terminal[n]
        ]
        if not frontier:
            break
        bids, players, (avg, _, _, _) = _solve_frontier(
            bsolver, frontier, full, None, None
        )
        avg = np.asarray(avg)
        next_frontier = []
        for i, (n, beliefs) in enumerate(frontier):
            root_policy = avg[i, 0]  # [H, A]
            strategy[n] = root_policy
            pid = full.node_player(n)
            lo = int(full.first_action[n])
            for k in range(int(full.num_children[n])):
                a = lo + k
                child = int(full.children_begin[n]) + k
                nb = beliefs.copy()
                nb[pid] = _normalize_safe_np(
                    beliefs[pid] * root_policy[:, a], eps
                )
                next_frontier.append((child, nb))
        frontier = next_frontier
    return strategy


def compute_strategy_recursive_to_leaf(
    game: LiarsDice,
    params: SubgameSolvingParams,
    value_fn: ValueFn | None = None,
    use_sampling_strategy: bool = False,
    sample_iters_seed: int | None = None,
    root_only: bool = False,
    dtype=jnp.float64,
) -> np.ndarray:
    """Whole-subgame-copy recursion (compute_strategy_recursive_to_leaf,
    recursive_solving.cc:76-134): copy the entire subgame policy into the
    full tree; recurse only at the subgame's non-terminal leaves with
    beliefs propagated along the subgame path.

    With ``sample_iters_seed`` set this becomes
    ``compute_sampled_strategy_recursive_to_leaf``
    (recursive_solving.cc:301-327): each subgame stops at a random even
    iteration with linear weights, and the *sampling* strategy is copied
    (``use_sampling_strategy=True`` implied by the reference call site).

    ``root_only``: only the root subgame is depth-limited; recursion
    below uses full-depth solves (recursive_solving.cc:320-322).
    """
    full = unroll_tree(game)
    bsolver = BatchSubgameSolver(game, params, dtype, value_fn)
    deep_solver = (
        BatchSubgameSolver(
            game, params, dtype, value_fn, max_depth=game.max_depth
        )
        if root_only
        else bsolver
    )
    sup = bsolver.tree
    eps = reach_eps(dtype)
    H, A = game.num_hands, game.num_actions
    strategy = np.zeros((full.num_nodes, H, A))

    rng = None
    iteration_weights = None
    if sample_iters_seed is not None:
        rng = np.random.RandomState(sample_iters_seed)
        iteration_weights = stop_iteration_weights(params.num_iters)
        use_sampling_strategy = True

    frontier = [(0, np.full((2, H), 1.0 / H))]
    at_root = True
    while frontier:
        frontier = [(n, b) for n, b in frontier if not full.is_terminal[n]]
        if not frontier:
            break
        solver_i = bsolver if at_root else deep_solver
        at_root = False
        bids, players, (avg, samp, r_samp, r_avg) = _solve_frontier(
            solver_i, frontier, full, rng, iteration_weights
        )
        copy_strat = np.asarray(samp if use_sampling_strategy else avg)
        # Belief propagation: the sampled mode walks with the sampling
        # strategy (get_belief_propogation_strategy), the non-sampled
        # mode with the average (recursive_solving.cc:96-102).
        reaches = r_samp if use_sampling_strategy else r_avg
        reaches = np.asarray(reaches)  # [B, 2, N_sup, H]
        next_frontier = []
        sup_i = solver_i.tree
        for i, (n, _) in enumerate(frontier):
            m = _map_supertree_to_full(sup_i, full, n)
            valid = m != NO_CHILD
            strategy[m[valid]] = copy_strat[i][valid]
            # Recurse at non-terminal subgame leaves with the path-product
            # beliefs, normalized (recursive_solving.cc:126-132).
            for s in np.nonzero(valid & sup_i.is_leaf & ~sup_i.is_terminal)[0]:
                fn = int(m[s])
                if full.num_children[fn] == 0:
                    continue  # full-tree leaf: nothing below
                nb = np.stack(
                    [
                        _normalize_safe_np(reaches[i, 0, s], eps),
                        _normalize_safe_np(reaches[i, 1, s], eps),
                    ]
                )
                next_frontier.append((fn, nb))
        frontier = next_frontier
    return strategy


def resolved_net_compute_dtype(
    engine: str, solver_dtype, requested=None, interpret: bool = False
) -> str:
    """The dtype the value-net MLP is actually computed in by an eval
    engine — stamped into eval result provenance next to ``engine`` so a
    cell records whether its net ran in bf16 (the pallas production path
    on real TPU) or f32/f64.  Mirrors
    :class:`Grid2FrontierSolver.__post_init__`'s selection exactly (the
    class itself resolves through this function)."""
    if engine != "pallas":
        # The grid engine evaluates value_fn in the solver dtype.
        return jnp.dtype(solver_dtype).name
    interpret = interpret or jax.default_backend() not in ("tpu", "axon")
    if requested is not None:
        return jnp.dtype(requested).name
    return "float32" if interpret else "bfloat16"


@dataclasses.dataclass(frozen=True, eq=False)
class Grid2FrontierSolver:
    """Depth-2 frontier solver, vmapped over lanes.

    Used by the batched sampled-strategy evaluation: each lane is one
    (repeat, subgame-root) pair; the per-lane stop iteration ``t`` is
    realized by snapshotting the sampling strategy at ``t`` inside the
    full iteration scan (identical results to stopping at ``t``).

    ``engine`` picks the lane solver:

    - ``"fast"`` (default): the gather-free action-grid engine
      (:class:`rebel_tpu.solving.grid2.Grid2Solver`), any dtype, any
      ``value_fn``.
    - ``"pallas"``: the fused TPU kernel
      (:class:`rebel_tpu.solving.grid2p.Grid2PallasSolver`) — the same
      engine the production self-play generator runs, ~3x the grid
      engine's iteration throughput on a v5e chip (bench.py).  f32
      only, and the value net must be the standard ``CFVNet`` shape
      passed as raw ``net_params`` (the kernel computes the MLP
      in-loop); ``net_params=None`` elides the net (zero leaf values,
      matching ``zero_value_fn``).  Snapshot-at-``t`` semantics are
      kernel-exact vs the other engines (tests/test_grid2_pallas.py).
    """

    game: LiarsDice
    params: SubgameSolvingParams
    dtype: jnp.dtype = jnp.float64
    value_fn: ValueFn | None = None
    chunk: int = 1024
    engine: str = "fast"
    net_params: object | None = None
    lane_block: int = 256
    # None = auto: bf16 on real TPU (the kernel's production fast path —
    # the f32 exact-erf MLP path RET_CHECK-faults in the Mosaic MXU
    # transpose pass at eval shapes, observed live on v5e), f32 in the
    # interpreter where exact equality with the grid engine is pinned.
    net_compute_dtype: object | None = None
    interpret: bool = False

    def __post_init__(self):
        assert self.params.max_depth == 2
        if self.engine == "pallas":
            if jnp.dtype(self.dtype) != jnp.dtype(jnp.float32):
                raise ValueError(
                    "engine='pallas' solves in float32; got dtype="
                    f"{jnp.dtype(self.dtype).name} (use engine='fast' "
                    "for f64 parity runs)"
                )
            from rebel_tpu.solving.grid2p import Grid2PallasSolver

            if self.net_params is None and self.value_fn is not None:
                # The kernel computes the MLP in-loop from raw
                # net_params; a value_fn alone would be silently
                # ignored, turning a net eval into a zero-net eval.
                if getattr(
                    self.value_fn, "__wrapped_kind__", None
                ) != "zero":
                    raise ValueError(
                        "engine='pallas' evaluates the net from raw "
                        "net_params; a value_fn without net_params "
                        "would silently run a zero-net eval. Pass "
                        "net_params (the checkpoint's flax param dict) "
                        "or drop value_fn for an explicit zero-net run."
                    )
            # Off-TPU the Mosaic kernel cannot lower; fall back to the
            # (slow, exact) interpreter so --engine pallas still
            # *works* everywhere it is asked for.
            interpret = (
                self.interpret
                or jax.default_backend() not in ("tpu", "axon")
            )
            net_dtype = jnp.dtype(
                resolved_net_compute_dtype(
                    "pallas", self.dtype, self.net_compute_dtype,
                    self.interpret,
                )
            )
            psolver = Grid2PallasSolver(
                game=self.game,
                params=self.params,
                lane_block=self.lane_block,
                net_compute_dtype=net_dtype,
                interpret=interpret,
            )
            # jit the kernel invocation: an eager pallas_call re-traces
            # the whole 1024-iteration kernel on every chunk (~18 s of
            # host work per call on the tunneled chip — 100x the actual
            # device time).  One trace per padded lane shape instead.
            psolve = jax.jit(
                lambda b, p, bel, t, np_: psolver.solve(b, p, bel, t, np_)
            )
            object.__setattr__(self, "_psolver", psolver)
            object.__setattr__(self, "_psolve_jit", psolve)
            object.__setattr__(self, "_solve", None)
            return
        if self.engine != "fast":
            raise ValueError(f"unknown frontier engine {self.engine!r}")
        from rebel_tpu.solving.grid2 import Grid2Solver

        solver = Grid2Solver(
            game=self.game,
            params=self.params,
            dtype=self.dtype,
            value_fn=self.value_fn,
        )

        def solve_one(bid, player, beliefs, t):
            root = RootCtx.of(self.game, bid, player)
            state = solver.init(root, beliefs)
            snap = solver.sampling_strategy(state, root)

            def body(carry, it):
                st, sn = carry
                cur = solver.sampling_strategy(st, root)
                sn = jax.tree.map(
                    lambda c, s: jnp.where(it == t, c, s), cur, sn
                )
                st = solver.step(st, it % 2, root)
                return (st, sn), None

            (state, snap), _ = jax.lax.scan(
                body, (state, snap), jnp.arange(self.params.num_iters)
            )
            fin = solver.sampling_strategy(state, root)
            snap = jax.tree.map(
                lambda f, s: jnp.where(t == self.params.num_iters, f, s),
                fin, snap,
            )
            return snap  # (p0 [H, A], p1 [A, H, A])

        object.__setattr__(self, "_solve", jax.jit(jax.vmap(solve_one)))

    def solve(self, bids, players, beliefs, stops):
        """bids/players/stops [B], beliefs [B, 2, H] ->
        (snap0 [B, H, A], snap1 [B, A, H, A]) as numpy."""
        if self.engine == "pallas":
            return self._solve_pallas_chunks(bids, players, beliefs, stops)
        B = int(np.shape(bids)[0])
        outs0, outs1 = [], []
        for lo in range(0, B, self.chunk):
            hi = min(lo + self.chunk, B)
            # Pad partial chunks up to a power of two so the jitted
            # solve sees a bounded set of shapes (the frontier size
            # varies per recursion level and repeat block; compiling
            # per exact size dominated eval wall-clock on TPU).  The
            # pad target must NOT be clamped to B: a 192-lane call must
            # pad to 256, not run un-padded at a fresh 192-lane shape.
            size = 1 << (hi - lo - 1).bit_length()
            pad = size - (hi - lo)
            rows = lambda x: np.concatenate(
                [x[lo:hi]] + ([x[lo : lo + 1]] * pad if pad else []), 0
            )
            s0, s1 = self._solve(
                jnp.asarray(rows(np.asarray(bids, np.int32))),
                jnp.asarray(rows(np.asarray(players, np.int32))),
                jnp.asarray(rows(np.asarray(beliefs)), self.dtype),
                jnp.asarray(rows(np.asarray(stops, np.int32))),
            )
            outs0.append(np.asarray(s0)[: hi - lo])
            outs1.append(np.asarray(s1)[: hi - lo])
        return np.concatenate(outs0, 0), np.concatenate(outs1, 0)

    def _solve_pallas_chunks(self, bids, players, beliefs, stops):
        """Fused-kernel lane batches.  The kernel requires the batch to
        be a lane_block multiple; partial chunks pad to
        max(lane_block, next power of two) — the same bounded-shape-set
        rationale as the fast path (at chunk=1024, lane_block=256 that
        is three compiled shapes total)."""
        B = int(np.shape(bids)[0])
        LB = self.lane_block
        outs0, outs1 = [], []
        for lo in range(0, B, self.chunk):
            hi = min(lo + self.chunk, B)
            size = max(LB, 1 << (hi - lo - 1).bit_length())
            pad = size - (hi - lo)
            rows = lambda x, d: np.concatenate(
                [np.asarray(x[lo:hi], d)]
                + ([np.asarray(x[lo : lo + 1], d)] * pad if pad else []),
                0,
            )
            out = self._psolve_jit(
                rows(bids, np.int32),
                rows(players, np.int32),
                rows(beliefs, np.float32),
                rows(stops, np.int32),
                self.net_params,
            )
            outs0.append(np.asarray(out.snap0)[: hi - lo])
            outs1.append(np.asarray(out.snap1)[: hi - lo])
        return np.concatenate(outs0, 0), np.concatenate(outs1, 0)


def compute_sampled_strategies_to_leaf_batch(
    game: LiarsDice,
    params: SubgameSolvingParams,
    value_fn: ValueFn | None,
    seeds: list[int],
    dtype=jnp.float64,
    chunk: int = 1024,
    fsolver: "Grid2FrontierSolver | None" = None,
) -> np.ndarray:
    """Batched ``compute_sampled_strategy_recursive_to_leaf`` over many
    repeat seeds at ``max_depth == 2`` (the paper protocol,
    /root/reference/scripts/eval_all.py:61-104).

    The recursion's frontier *structure* (which full-tree nodes get a
    subgame) is deterministic and identical across repeats; only beliefs
    and per-subgame stop iterations differ.  So all repeats advance in
    lockstep and every frontier level is solved as one dense device
    batch — replacing the reference's thread pool over repeats
    (recursive_eval.cc:117-191) with lane parallelism.

    Per-repeat stop-iteration draws replicate the sequential
    implementation exactly (same RandomState(seed), same draw order), so
    results match ``compute_sampled_strategy_recursive_to_leaf`` lane
    for lane.  Returns strategies ``[R, N_full, H, A]`` (solver dtype).
    """
    assert params.max_depth == 2
    full = unroll_tree(game)
    if fsolver is None:
        # Callers looping over seed blocks should build one solver and
        # pass it in — its jitted vmapped solve (and every compiled
        # lane shape) is reused across calls.
        fsolver = Grid2FrontierSolver(game, params, dtype, value_fn, chunk)
    eps = reach_eps(dtype)
    H, A = game.num_hands, game.num_actions
    liar = game.liar_call
    R = len(seeds)
    npdt = np.dtype(jnp.dtype(dtype).name)
    strategy = np.zeros((R, full.num_nodes, H, A), npdt)
    rngs = [np.random.RandomState(s) for s in seeds]
    weights = stop_iteration_weights(params.num_iters)
    pw = weights / weights.sum()

    # frontier: list of (full-tree node, beliefs [R, 2, H])
    frontier = [(0, np.full((R, 2, H), 1.0 / H, npdt))]
    while frontier:
        frontier = [(n, b) for n, b in frontier if not full.is_terminal[n]]
        if not frontier:
            break
        F = len(frontier)
        nodes = [n for n, _ in frontier]
        bids = np.array([full.last_bid[n] for n in nodes], np.int32)
        players = np.array([full.node_player(n) for n in nodes], np.int32)
        # Per-repeat stops drawn in frontier order (matches the
        # sequential path's RandomState usage, recursive_solving.cc:305-318).
        stops = np.stack(
            [rng.choice(len(weights), size=F, p=pw) for rng in rngs]
        ).astype(np.int32)  # [R, F]
        beliefs = np.stack([b for _, b in frontier], axis=1)  # [R, F, 2, H]

        snap0, snap1 = fsolver.solve(
            np.tile(bids, R),
            np.tile(players, R),
            beliefs.reshape(R * F, 2, H),
            stops.reshape(R * F),
        )
        snap0 = snap0.reshape(R, F, H, A)
        snap1 = snap1.reshape(R, F, A, H, A)

        next_frontier = []
        for i, n in enumerate(nodes):
            strategy[:, n] = snap0[:, i]
            p0 = int(players[i])
            for a1 in range(int(bids[i]) + 1, A):
                c1 = full.child_index[n, a1]
                if c1 == NO_CHILD or a1 == liar:
                    continue
                strategy[:, c1] = snap1[:, i, a1]
                for a2 in range(a1 + 1, A):
                    c2 = full.child_index[c1, a2]
                    if c2 == NO_CHILD or a2 == liar:
                        continue
                    if full.num_children[c2] == 0:
                        continue
                    nb = np.empty((R, 2, H), npdt)
                    nb[:, p0] = _normalize_safe_np(
                        beliefs[:, i, p0] * snap0[:, i, :, a1], eps
                    )
                    nb[:, 1 - p0] = _normalize_safe_np(
                        beliefs[:, i, 1 - p0] * snap1[:, i, a1, :, a2], eps
                    )
                    next_frontier.append((int(c2), nb))
        frontier = next_frontier
    return strategy


def compute_sampled_strategy_recursive_to_leaf(
    game: LiarsDice,
    params: SubgameSolvingParams,
    value_fn: ValueFn | None = None,
    seed: int = 0,
    root_only: bool = False,
    dtype=jnp.float64,
) -> np.ndarray:
    """Training-time-emulating sampled strategy
    (recursive_solving.cc:301-327)."""
    return compute_strategy_recursive_to_leaf(
        game,
        params,
        value_fn,
        use_sampling_strategy=True,
        sample_iters_seed=seed,
        root_only=root_only,
        dtype=dtype,
    )
