"""Evaluation harness — the ``recursive_eval`` equivalent.

Mirrors /root/reference/csrc/liars_dice/recursive_eval.cc:

* Phase 1 (``full_solve``): solve the full tree for ``subgame_iters``,
  printing exploitability at power-of-2 iterations
  (recursive_eval.cc:276-309).
* Phase 2 (``sampled_eval``): ``num_repeats`` independent sampled
  recursive-to-leaf strategies (seed = repeat id,
  recursive_eval.cc:136-137), averaged **weighted by per-infoset reach**
  of the acting player (``summed += strat * reach; final = sum / (sum
  reach + 1e-6)``, recursive_eval.cc:349-363), with exploitability and
  EV-vs-full reported at power-of-2 repeat counts.
* Machine-readable ``XXX {...}`` / ``YYY {...}`` JSON result lines
  (recursive_eval.cc:409-425), parsed by the eval_all sweep.
"""

from __future__ import annotations

import json
import logging
import pathlib
from typing import Callable

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.eval.recursive import (
    compute_sampled_strategy_recursive_to_leaf,
    resolved_net_compute_dtype as _resolved_net_dtype,
)
from rebel_tpu.solving.core import RootCtx, SolverContext, ValueFn
from rebel_tpu.solving.exploitability import (
    compute_ev2,
    compute_exploitability2,
    full_tree_context,
    uniform_beliefs,
)
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.solver import build_solver

log = logging.getLogger(__name__)


def full_solve(
    game: LiarsDice,
    params: SubgameSolvingParams,
    dtype=jnp.float64,
    progress: bool = True,
    collect_iterates: bool = False,
):
    """Phase 1: full-tree solve with power-of-2 exploitability printouts
    (recursive_eval.cc:276-309).  With ``collect_iterates`` (CFR), the
    even-iteration sampling strategies are returned for the
    immediate-regret report (recursive_eval.cc:283-287).
    Returns (strategy [N,H,A], trajectory list, iterates list) — each
    iterate is a *flattened* [N*H*A] host array (see
    ``run_chunk_collect`` for why)."""
    ctx = full_tree_context(game, dtype)
    solver = build_solver(ctx, params.replace(max_depth=10**6))
    root = RootCtx.concrete(ctx.tree)
    state = solver.init(root, uniform_beliefs(game, dtype))
    step = jax.jit(solver.step)

    @partial(jax.jit, static_argnums=(2,))
    def run_chunk(state, start, n):
        # `n` iterations starting at absolute iteration `start` (the
        # alternating traverser and discount schedules depend on it).
        def body(st, i):
            return solver.step(st, (start + i) % 2, root), None

        state, _ = jax.lax.scan(body, state, jnp.arange(n))
        return state

    @partial(jax.jit, static_argnums=(2,))
    def run_chunk_collect(state, start, n):
        # Same, also emitting the sampling strategy AFTER each step at
        # even absolute iterations (recursive_eval.cc:283-287: step,
        # THEN push_back when iter % 2 == 0 — unlike the gtest's
        # collect-before-step, subgame_solving_test.cc:194-198).
        # Iterates are emitted flattened ([N*H*A]) so the stacked device
        # buffer tiles compactly — stacking [n, N, H, A] puts the tiny
        # (H, A) dims in the minor tiled positions and inflates HBM
        # ~20x, which OOMs the chip on the 8191-node 2x3f tree.
        def body(st, i):
            st = solver.step(st, (start + i) % 2, root)
            samp = solver.sampling_strategy(st).reshape(-1)
            return st, samp

        state, samps = jax.lax.scan(body, state, jnp.arange(n))
        return state, samps

    trajectory = []
    iterates = []
    # Cap the device-resident iterate stack per collect call to ~256 MB
    # (power-of-2 block so the jitted chunk sees a bounded shape set).
    flat = ctx.N * ctx.H * ctx.A * jnp.dtype(dtype).itemsize
    collect_block = max(1, min(512, int(2 ** np.floor(np.log2(
        max(1, (256 << 20) // flat))))))
    checkpoints = sorted(
        {1 << k for k in range(params.num_iters.bit_length())}
        | {params.num_iters}
    )
    checkpoints = [c for c in checkpoints if c <= params.num_iters]
    it = 0
    for target in checkpoints:
        if collect_iterates and params.use_cfr:
            while it < target:
                n = min(collect_block, target - it)
                state, samps = run_chunk_collect(state, it, n)
                samps = np.asarray(samps)
                # Even absolute iterations only
                # (recursive_eval.cc:285-287).
                offset = (-it) % 2
                iterates.extend(samps[offset::2])
                it += n
        else:
            state = run_chunk(state, it, target - it)
            it = target
        e0, e1 = compute_exploitability2(
            ctx, solver.average_strategy(state, root)
        )
        trajectory.append(
            {"iter": it, "e0": e0, "e1": e1, "sum": (e0 + e1) / 2}
        )
        if progress:
            log.info(
                "Iter=%8d exploitabilities=(%.3e, %.3e) sum=%.3e",
                it, e0, e1, (e0 + e1) / 2,
            )
    return (
        np.asarray(solver.average_strategy(state, root)),
        trajectory,
        iterates,
    )


def acting_player_reach(
    ctx: SolverContext, strategy: np.ndarray
) -> np.ndarray:
    """[N, H] blueprint reach of each node's *acting player* from uniform
    beliefs — the infoset weights of the sampled-strategy average
    (recursive_eval.cc:143-149, using compute_stategy_stats reaches)."""
    root = RootCtx.concrete(ctx.tree)
    beliefs = uniform_beliefs(ctx.game, ctx.dtype)
    s = jnp.asarray(strategy, ctx.dtype)
    r0 = ctx.compute_reaches(s, beliefs[0], 0, root)
    r1 = ctx.compute_reaches(s, beliefs[1], 1, root)
    player = (ctx.tree.depth % 2).astype(bool)  # root player 0
    return np.where(player[:, None], np.asarray(r1), np.asarray(r0))


@partial(jax.jit, static_argnums=0)
def _acting_player_reach_one(ctx: SolverContext, s) -> jnp.ndarray:
    # Module-level jit (keyed on the hashable ctx): defining this inside
    # acting_player_reach_batch would re-trace per call/chunk.
    root = RootCtx.concrete(ctx.tree)
    beliefs = uniform_beliefs(ctx.game, ctx.dtype)
    player = jnp.asarray((ctx.tree.depth % 2).astype(bool))
    r0 = ctx.compute_reaches(s, beliefs[0], 0, root)
    r1 = ctx.compute_reaches(s, beliefs[1], 1, root)
    return jnp.where(player[:, None], r1, r0)


def acting_player_reach_batch(
    ctx: SolverContext, strategies: np.ndarray
) -> np.ndarray:
    """[R, N, H, A] -> [R, N, H] acting-player reach per repeat (device
    batched version of :func:`acting_player_reach`)."""
    return np.stack(
        [
            np.asarray(_acting_player_reach_one(ctx, jnp.asarray(s, ctx.dtype)))
            for s in strategies
        ]
    )


def sampled_eval(
    game: LiarsDice,
    params: SubgameSolvingParams,
    value_fn: ValueFn | None,
    num_repeats: int,
    full_strategy: np.ndarray | None,
    mdp_depth: int = 2,
    dtype=jnp.float64,
    progress: bool = True,
    batched: bool | None = None,
    max_chunk: int | None = None,
    on_report: Callable[[list], None] | None = None,
    acc_path: str | pathlib.Path | None = None,
    acc_sig: str = "",
    acc_sig_alt: tuple = (),
    resume: bool = False,
    engine: str = "fast",
    net_params=None,
):
    """Phase 2: reach-weighted average of sampled recursive strategies.

    ``acc_path`` (if given) receives an atomic .npz snapshot of the
    reach-weighted accumulator after every power-of-2 report; with
    ``resume=True`` a matching snapshot (same ``acc_sig``, or one of the
    ``acc_sig_alt`` grandfathered signatures — see :func:`run_eval`) is
    loaded and the seed loop continues from where it stopped — per-seed
    results are deterministic in the seed index, so the resumed run is
    exact.  Snapshots are always re-saved under ``acc_sig``.

    ``batched`` (default: auto, on when ``mdp_depth == 2``) runs repeats
    as device lane batches via
    :func:`rebel_tpu.eval.recursive.compute_sampled_strategies_to_leaf_batch`
    — same per-seed results as the sequential path, minutes instead of
    hours at the paper protocol's 1024 repeats.

    ``on_report`` (if given) is called with the reports-so-far list after
    every power-of-2 report — hook for streaming partial results to disk
    so a killed run keeps everything it computed.

    ``engine="pallas"`` (batched path only) solves the per-lane subgames
    with the fused TPU kernel instead of the XLA grid engine — pass the
    checkpoint's raw ``net_params``; see
    :class:`rebel_tpu.eval.recursive.Grid2FrontierSolver`."""
    ctx = full_tree_context(game, dtype)
    sub_params = params.replace(max_depth=mdp_depth)
    if batched is None:
        batched = mdp_depth == 2
    if engine != "fast" and not batched:
        raise ValueError(
            f"engine={engine!r} is only available on the batched "
            "(mdp_depth == 2) sampled-eval path"
        )
    if max_chunk is None:
        # Bound the [Rc, N, H, A] per-chunk strategy block to ~256 MB.
        per = ctx.tree.num_nodes * game.num_hands * game.num_actions * 8
        max_chunk = max(1, min(256, int(2 ** np.floor(np.log2(
            max(1, 256 * 2**20 // per))))))
    summed_strategy = None
    summed_reach = None
    reports = []
    done = 0
    if acc_path is not None:
        acc_path = pathlib.Path(acc_path)
    if resume and acc_path is not None and acc_path.exists():
        try:
            z = np.load(acc_path, allow_pickle=False)
            if (
                str(z["sig"]) in (acc_sig, *acc_sig_alt)
                and int(z["done"]) <= num_repeats
            ):
                summed_strategy = z["strategy"]
                summed_reach = z["reach"]
                done = int(z["done"])
                reports = json.loads(str(z["reports"]))
                log.info("resuming sampled eval at %d repeats", done)
            else:
                log.warning(
                    "accumulator %s does not match (sig %r vs %r); "
                    "starting fresh", acc_path, str(z["sig"]), acc_sig,
                )
                # Move the refused snapshot aside NOW: if this fresh run
                # dies before its first save_acc, the partial JSON has
                # already been restamped with the new net, and a later
                # resume would otherwise grandfather this foreign
                # accumulator in via the legacy-sig path.
                stale = acc_path.with_name(acc_path.name + ".stale")
                acc_path.replace(stale)
                log.warning("stale accumulator moved to %s", stale)
        except Exception as e:  # corrupt snapshot: start fresh
            log.warning("could not load accumulator %s (%s)", acc_path, e)

    def save_acc():
        if acc_path is None:
            return
        tmp = acc_path.with_name(acc_path.name + ".tmp.npz")
        with open(tmp, "wb") as f:
            np.savez(
                f, strategy=summed_strategy, reach=summed_reach,
                done=done, reports=json.dumps(reports), sig=acc_sig,
            )
        tmp.replace(acc_path)

    start = done

    def strat_reach_chunks():
        if batched:
            from rebel_tpu.eval.recursive import (
                Grid2FrontierSolver,
                compute_sampled_strategies_to_leaf_batch,
            )

            # One frontier solver across all seed blocks: its jitted
            # vmapped solve (one compile per lane-shape) is the
            # expensive thing; rebuilding it per block would re-trace
            # and re-compile every shape each time.
            fsolver = Grid2FrontierSolver(
                game, sub_params, dtype, value_fn,
                engine=engine, net_params=net_params,
            )
            # Uniform full-size seed blocks: the power-of-2 report
            # boundaries are taken by per-seed accumulation below, so
            # there is no need for small device batches (whose varying
            # shapes each cost a TPU compile).
            for lo in range(start, num_repeats, max_chunk):
                seeds = list(range(lo, min(lo + max_chunk, num_repeats)))
                strats = compute_sampled_strategies_to_leaf_batch(
                    game, sub_params, value_fn, seeds, dtype=dtype,
                    fsolver=fsolver,
                ).astype(np.float32)
                reaches = acting_player_reach_batch(ctx, strats).astype(
                    np.float32
                )
                yield strats, reaches
        else:
            for rep in range(start, num_repeats):
                strat = compute_sampled_strategy_recursive_to_leaf(
                    game, sub_params, value_fn, seed=rep, dtype=dtype
                ).astype(np.float32)[None]
                reach = acting_player_reach(ctx, strat[0]).astype(
                    np.float32
                )[None]
                yield strat, reach

    # float32 accumulation mirrors the reference's torch f32 tensors
    # (recursive_eval.cc:83-96).  Seeds accumulate one at a time (cheap
    # host adds) so every power-of-2 repeat count gets a report
    # regardless of the device chunking above.
    for strats, reaches in strat_reach_chunks():
        chunk_saved = False
        for i in range(strats.shape[0]):
            contrib = strats[i] * reaches[i][:, :, None]
            rsum = reaches[i][:, :, None]
            if summed_strategy is None:
                # NB: rsum is a view into the yielded chunk — copy so
                # the += below never mutates the producer's buffer.
                summed_strategy, summed_reach = contrib, rsum.copy()
            else:
                summed_strategy += contrib
                summed_reach += rsum
            done += 1
            if (done & (done - 1)) != 0 and done != num_repeats:
                continue
            final = summed_strategy / (summed_reach + 1e-6)
            e0, e1 = compute_exploitability2(ctx, final)
            report = {
                "repeats": done,
                "e0": e0,
                "e1": e1,
                "exploitability": (e0 + e1) / 2,
            }
            if full_strategy is not None:
                ev0, ev1 = compute_ev2(ctx, full_strategy, final)
                report.update(
                    ev_full_0=ev0, ev_full_1=ev1, ev_full=(ev0 + ev1) / 2
                )
            reports.append(report)
            save_acc()
            chunk_saved = i == strats.shape[0] - 1
            if on_report is not None:
                on_report(reports)
            if progress:
                log.info(
                    "%5d: %.6g (%.6g,%.6g)\tEV of full: %s",
                    done, (e0 + e1) / 2, e0, e1,
                    "%.6g" % report["ev_full"]
                    if full_strategy is not None else "-",
                )
        # Snapshot after every device chunk, not just at power-of-2
        # report boundaries: between the 512 and 1024 reports a 1x6
        # eval computes for ~an hour, and a kill there should lose at
        # most one chunk (seeds are deterministic in the repeat index,
        # so resume from any `done` is exact).
        if not chunk_saved:
            save_acc()
    final = summed_strategy / (summed_reach + 1e-6)
    return final, reports


def ensure_dtype_support(dtype) -> None:
    """float64 solving requires jax x64 mode; without it arrays silently
    truncate to f32 while the 1e-80 smoothing constants underflow to
    zero, producing NaNs in safe normalization.

    It also requires a backend with real f64 arithmetic: TPUs compute
    f64 as truncated f32 even under x64, which reproduces the same NaN
    signature *plus* silently-wrong full-tree values — refuse loudly
    instead (observed live: an ``--f64`` eval accidentally routed to the
    TPU produced full_tree 0.0477 vs the true 0.0003 and NaN sampled
    reports)."""
    if jnp.dtype(dtype).itemsize != 8:
        return
    backend = jax.default_backend()
    # Only TPU-family backends truncate f64 to f32; CUDA/ROCm have real
    # f64 arithmetic and just need x64 mode like CPU.
    if backend in ("tpu", "axon"):
        raise RuntimeError(
            f"float64 solving requested on backend {backend!r}, which "
            "has no f64 arithmetic (values silently truncate to f32 "
            "and the solver's 1e-80 smoothing constants underflow to "
            "NaN). Run float64 evals on CPU — e.g. scripts/eval_all.py "
            "--f64 --platform cpu; note JAX_PLATFORMS=cpu as an env "
            "var does not override this environment's sitecustomize."
        )
    if not jax.config.jax_enable_x64:
        log.info("enabling jax x64 for float64 solving")
        jax.config.update("jax_enable_x64", True)


def run_eval(
    game: LiarsDice,
    base_params: SubgameSolvingParams,
    value_fn: ValueFn | None = None,
    subgame_iters: int = 1024,
    num_repeats: int = 0,
    mdp_depth: int = 2,
    dtype=jnp.float64,
    partial_path: str | pathlib.Path | None = None,
    regret_summary_report: bool = True,
    resume: bool = False,
    max_chunk: int | None = None,
    net_name: str | None = None,
    engine: str = "fast",
    net_params=None,
) -> dict:
    """Full recursive_eval flow; returns the XXX/YYY-equivalent dict.

    ``regret_summary_report=False`` skips collecting CFR iterates for
    the immediate-regret summary (the reference's --print_regret_summary
    defaults to off, recursive_eval.cc:203-204) — worth it on big games
    over a slow device link, where streaming every even iterate to the
    host costs real wall-clock.

    ``partial_path`` (if given) receives an atomically-rewritten JSON
    snapshot of the result after phase 1 and after every power-of-2
    sampled report, so a run killed by a deadline keeps everything it
    computed (the reference only writes at exit, recursive_eval.cc:409)."""
    ensure_dtype_support(dtype)
    params = base_params.replace(num_iters=subgame_iters)

    def write_partial(obj: dict) -> None:
        if partial_path is None:
            return
        p = pathlib.Path(partial_path)
        tmp = p.with_name(p.name + ".tmp")
        tmp.write_text(json.dumps(obj, indent=1))
        tmp.replace(p)

    full_strategy, trajectory, iterates = full_solve(
        game, params, dtype,
        collect_iterates=params.use_cfr and regret_summary_report,
    )
    ctx = full_tree_context(game, dtype)
    e0, e1 = compute_exploitability2(ctx, full_strategy)

    results = {"full_tree": (e0 + e1) / 2}
    regret_summary = None
    if iterates:
        from rebel_tpu.solving.exploitability import (
            immediate_regret_summary,
        )

        # Stream fixed-size blocks so device memory stays bounded at one
        # block however many iterates the solve produced.
        block = 64
        regs = np.asarray(
            immediate_regret_summary(
                ctx,
                (
                    np.stack(iterates[i : i + block])
                    for i in range(0, len(iterates), block)
                ),
            )
        )
        regret_summary = {
            "max": float(regs.max()),
            "mean": float(regs.mean()),
        }
        log.info(
            "immediate regrets: max %.3e mean %.3e",
            regret_summary["max"], regret_summary["mean"],
        )
    results_ev = {}
    reports = []
    partial = {
        # Provenance: which net produced this snapshot, so a protocol
        # table built from a partial can still cite its checkpoint
        # (the reference caches results keyed beside the ckpt,
        # /root/reference/scripts/eval_all.py:48-58).
        "game": f"{game.num_dice}x{game.num_faces}",
        "solver": "cfr" if params.use_cfr else "fp",
        "net": net_name,
        "engine": engine,
        # bf16 on the pallas production path on real TPU, f32/f64
        # elsewhere — a cell's dtype provenance next to its engine.
        "net_compute_dtype": _resolved_net_dtype(engine, dtype),
        "exploitability": dict(results),
        "ev": {},
        "full_trajectory": trajectory,
        "sampled_reports": reports,
        "immediate_regrets": regret_summary,
        "partial": True,
    }
    # Capture the previous run's stamped net BEFORE overwriting the
    # partial: it validates grandfathered pre-net-sig accumulators below.
    prior_net = None
    if resume and partial_path is not None:
        try:
            prior_net = json.loads(
                pathlib.Path(partial_path).read_text()
            ).get("net")
        except Exception:
            pass
    write_partial(partial)
    if num_repeats > 0:
        if value_fn is None:
            raise ValueError("num_repeats > 0 requires a value net")

        def stream(reps):
            partial["sampled_reports"] = reps
            partial["exploitability"]["repeated toleaf (partial)"] = reps[
                -1
            ]["exploitability"]
            write_partial(partial)

        # The accumulator's strategies belong to ONE net: resuming under
        # any other net would silently blend two checkpoints' policies
        # into one cell.  The signature therefore carries the net
        # identity.  Pre-net-sig snapshots (written before this field
        # existed) are grandfathered only when the partial JSON next to
        # them stamps the same net — provenance added in the same round
        # (see the ``net`` key above).
        legacy_sig = (
            f"{game.num_dice}x{game.num_faces}-"
            f"{'cfr' if params.use_cfr else 'fp'}-{subgame_iters}-"
            f"{num_repeats}"
        )
        acc_sig = f"{legacy_sig}-net={net_name or 'anon'}"
        if engine != "fast":
            # Engines agree only to f32 rounding, so a cell never mixes
            # them across a resume; default-engine sigs stay unchanged.
            acc_sig += f"-engine={engine}"
        # Grandfathering applies only to the fast engine: every
        # pre-net-sig accumulator was produced by it, so a pallas resume
        # accepting one would blend fast-f32 and pallas-bf16 strategies
        # into one cell.
        sig_alt = (legacy_sig,) if (
            engine == "fast" and resume and net_name
            and prior_net == net_name
        ) else ()
        final, reports = sampled_eval(
            game, params, value_fn, num_repeats, full_strategy,
            mdp_depth, dtype,
            on_report=stream if partial_path is not None else None,
            acc_path=(
                str(partial_path) + ".acc.npz"
                if partial_path is not None else None
            ),
            acc_sig=acc_sig,
            acc_sig_alt=sig_alt,
            resume=resume,
            max_chunk=max_chunk,
            engine=engine,
            net_params=net_params,
        )
        last = reports[-1]
        results[f"repeated toleaf {num_repeats}"] = last["exploitability"]
        results_ev[f"repeated toleaf {num_repeats}"] = last["ev_full"]

    # Greppable result lines (recursive_eval.cc:409-425).
    print("XXX " + json.dumps({k: str(v) for k, v in results.items()}))
    print("YYY " + json.dumps({k: str(v) for k, v in results_ev.items()}))
    return {
        "exploitability": results,
        "ev": results_ev,
        "full_trajectory": trajectory,
        "sampled_reports": reports,
        "immediate_regrets": regret_summary,
        "net_compute_dtype": _resolved_net_dtype(engine, dtype),
    }


def _load_net(net_path: str, game, cfg: dict):
    """Load a checkpoint as ``(value_fn, net_params)`` from either this
    framework's pickled params exports or the reference's release
    formats (torch.save state dicts, scripts/eval_all.py:38-44;
    TorchScript exports, real_net.cc:57-87).  Routed by content: plain
    pickles load directly; anything else goes through the torch
    importer.  ``net_params`` is the raw flax param dict — what the
    fused-kernel eval engine consumes."""
    try:
        from rebel_tpu.training.trainer import load_params

        params = load_params(net_path)
        if not (isinstance(params, dict) and "params" in params):
            raise ValueError("not a rebel_tpu params export")
    except Exception:
        # Only routing failures (not a plain pickle / not our export
        # shape) fall through to the torch importer — a valid export
        # whose value-fn construction fails below must surface its own
        # error, not a misleading "not a torch checkpoint".
        from rebel_tpu.nets.torch_import import load_net2_checkpoint

        spec, tparams = load_net2_checkpoint(net_path, game)
        return spec.value_fn(tparams), tparams
    from rebel_tpu.nets.cfv_net import CFVNetSpec

    model = cfg.get("model", {}).get("kwargs", {})
    spec = CFVNetSpec(
        game=game,
        n_hidden=model.get("n_hidden", 256),
        n_layers=model.get("n_layers", 2),
        use_layer_norm=model.get("use_layer_norm", True),
    )
    return spec.value_fn(params), params


def _load_net_value_fn(net_path: str, game, cfg: dict):
    return _load_net(net_path, game, cfg)[0]


def run_eval_from_config(cfg: dict, exp_dir: pathlib.Path) -> dict:
    """Task entry for run.py: config keys ``env`` (game + subgame params),
    ``eval`` (net/subgame_iters/num_repeats/mdp_depth)."""
    env = cfg.get("env", {})
    game = LiarsDice(
        num_dice=env.get("num_dice", 1), num_faces=env.get("num_faces", 4)
    )
    sp = env.get("subgame_params", {})
    base_params = SubgameSolvingParams(
        num_iters=sp.get("num_iters", 1024),
        max_depth=sp.get("max_depth", 2),
        linear_update=sp.get("linear_update", True),
        use_cfr=sp.get("use_cfr", False),
    )
    ev = cfg.get("eval", {})
    net_path = ev.get("net", None)
    value_fn = None
    dtype = jnp.float64 if ev.get("f64", True) else jnp.float32
    if net_path == "zero":
        from rebel_tpu.nets.value_nets import zero_value_fn

        value_fn = zero_value_fn(game)
    elif net_path == "oracle":
        from rebel_tpu.nets.value_nets import make_oracle_value_fn

        value_fn = make_oracle_value_fn(game, base_params, dtype=dtype)
    elif net_path:
        value_fn = _load_net_value_fn(net_path, game, cfg)
    # Same crash resilience as the scripts/eval_all.py path: stream
    # partial snapshots into the experiment dir and (optionally) resume
    # the phase-2 accumulator.
    solver_tag = "cfr" if base_params.use_cfr else "fp"
    return run_eval(
        game,
        base_params,
        value_fn,
        subgame_iters=ev.get("subgame_iters", 1024),
        num_repeats=ev.get("num_repeats", 0),
        mdp_depth=ev.get("mdp_depth", base_params.max_depth),
        dtype=dtype,
        partial_path=pathlib.Path(exp_dir)
        / f"eval.{game.num_dice}x{game.num_faces}-{solver_tag}.partial",
        resume=bool(ev.get("resume", False)),
        regret_summary_report=bool(ev.get("regret_summary", True)),
        net_name=net_path if isinstance(net_path, str) else None,
    )
