#!/usr/bin/env python
"""Evaluation sweep — the /root/reference/scripts/eval_all.py equivalent.

The reference downloads released checkpoints for games
(1,4),(1,5),(1,6),(2,3) x {fp,cfr} and runs ``recursive_eval`` with
``--mdp_depth 2 --subgame_iters 1024 --num_repeats 1024``
(eval_all.py:33-44,61-104), caching results beside each checkpoint and
pivot-tabling full-tree vs ReBeL exploitability.  This sweep does the
same over locally-trained checkpoints (``*.params`` exports) or the
built-in oracle/zero nets.

Usage:
    python scripts/eval_all.py --net oracle --games 1x4 --solvers cfr \
        --subgame-iters 256 --num-repeats 16
    python scripts/eval_all.py --ckpt-root outputs/liars_sp --games 1x4 1x5
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def parse_game(s: str) -> tuple[int, int]:
    nd, nf = s.split("x")
    return int(nd), int(nf)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", nargs="+", default=["1x4", "1x5", "1x6", "2x3"])
    ap.add_argument("--solvers", nargs="+", default=["fp", "cfr"])
    ap.add_argument("--net", default=None,
                    help="'oracle', 'zero', or a .params path")
    ap.add_argument("--ckpt-root", default=None,
                    help="search <root>/.../ckpt/epoch*.params per game")
    ap.add_argument("--subgame-iters", type=int, default=1024)
    ap.add_argument("--num-repeats", type=int, default=1024)
    ap.add_argument("--mdp-depth", type=int, default=2)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--f32", dest="f64", action="store_false",
        help="solver in float32 (the default; kept for compatibility)")
    ap.add_argument(
        "--f64", dest="f64", action="store_true",
        help="solver in float64: enables jax x64 (without it a float64 "
        "request silently truncates to f32 — the round-2 1x5f-cfr eval "
        "artifact). Matches the reference's double-precision math; "
        "slow on TPU, fine on CPU.")
    ap.set_defaults(f64=False)
    ap.add_argument(
        "--resume", action="store_true",
        help="continue a killed phase-2 eval from its streamed "
        "accumulator snapshot (<out>.<game>-<solver>.partial.acc.npz); "
        "exact, since per-seed strategies are deterministic in the "
        "seed index")
    ap.add_argument(
        "--no-regrets", action="store_true",
        help="skip the CFR immediate-regret summary (the reference's "
        "--print_regret_summary default; saves the iterate download "
        "on big games)")
    ap.add_argument(
        "--max-chunk", type=int, default=None,
        help="repeats per device batch in the sampled eval (default: "
        "auto, bounded by a ~256 MB strategy block — conservative on a "
        "16 GB chip; raise for big games where the auto chunk drops to "
        "32 and underfills the device)")
    ap.add_argument(
        "--engine", default="fast", choices=("fast", "pallas"),
        help="phase-2 lane solver: 'fast' = XLA grid engine (any dtype/"
        "net); 'pallas' = the fused TPU kernel the self-play generator "
        "runs (~3x iteration throughput; f32 only, checkpoint nets "
        "only — the kernel computes the MLP in-loop)")
    ap.add_argument("--out", default="eval_all_results.json")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from rebel_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from rebel_tpu.eval.recursive_eval import run_eval
    from rebel_tpu.games.liars_dice import LiarsDice
    from rebel_tpu.solving.params import SubgameSolvingParams

    if args.f64:
        import jax

        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32
    rows = []
    for gstr in args.games:
        nd, nf = parse_game(gstr)
        game = LiarsDice(num_dice=nd, num_faces=nf)
        for solver in args.solvers:
            params = SubgameSolvingParams(
                num_iters=args.subgame_iters,
                max_depth=args.mdp_depth,
                linear_update=True,
                use_cfr=solver == "cfr",
            )
            value_fn = None
            net_params = None
            net_name = args.net or "none"
            if args.engine == "pallas" and args.net == "oracle":
                raise SystemExit(
                    "--engine pallas computes leaf values in-kernel and "
                    "cannot wrap the oracle value fn; use --engine fast"
                )
            if args.net == "oracle":
                from rebel_tpu.nets.value_nets import make_oracle_value_fn

                value_fn = make_oracle_value_fn(
                    game, params.replace(max_depth=10**6), dtype=dtype
                )
            elif args.net == "zero":
                from rebel_tpu.nets.value_nets import zero_value_fn

                value_fn = zero_value_fn(game)
            elif args.net:
                # Handles pickled .params exports and the reference's
                # torch state-dict / TorchScript release formats alike.
                from rebel_tpu.eval.recursive_eval import _load_net

                value_fn, net_params = _load_net(args.net, game, {})
            elif args.ckpt_root:
                ckpts = sorted(
                    pathlib.Path(args.ckpt_root).rglob("epoch*.params"),
                    key=lambda p: int(p.stem[5:]),
                )
                if not ckpts:
                    print(f"no checkpoints under {args.ckpt_root}; skipping")
                    continue
                from rebel_tpu.nets.cfv_net import CFVNetSpec
                from rebel_tpu.training.trainer import load_params

                net_name = str(ckpts[-1])
                spec = CFVNetSpec(game=game)
                net_params = load_params(ckpts[-1])
                value_fn = spec.value_fn(net_params)

            # Stream phase-1/phase-2 progress to a per-row partial file
            # (game/solver in the name so protocol_table can attribute
            # it) so a run killed by a timeout keeps every power-of-2
            # report it computed; completed rows land in <out>
            # immediately below.
            result = run_eval(
                game,
                params,
                value_fn,
                subgame_iters=args.subgame_iters,
                num_repeats=args.num_repeats if value_fn is not None else 0,
                mdp_depth=args.mdp_depth,
                dtype=dtype,
                partial_path=f"{args.out}.{gstr}-{solver}.partial",
                regret_summary_report=not args.no_regrets,
                resume=args.resume,
                max_chunk=args.max_chunk,
                net_name=net_name,
                engine=args.engine,
                net_params=net_params,
            )
            rows.append(
                {
                    "game": gstr,
                    "solver": solver,
                    "net": net_name,
                    "engine": args.engine,
                    "net_compute_dtype": result.get("net_compute_dtype"),
                    "full_tree": result["exploitability"].get("full_tree"),
                    "rebel": next(
                        (
                            v
                            for k, v in result["exploitability"].items()
                            if k.startswith("repeated")
                        ),
                        None,
                    ),
                    # Full detail for the record: the power-of-2 repeat
                    # reports (recursive_eval.cc:364-386) and the phase-1
                    # exploitability trajectory (recursive_eval.cc:283-301).
                    "sampled_reports": result.get("sampled_reports"),
                    "full_trajectory": result.get("full_trajectory"),
                    "immediate_regrets": result.get("immediate_regrets"),
                }
            )
            pathlib.Path(args.out).write_text(json.dumps(rows, indent=1))
            p = pathlib.Path(f"{args.out}.{gstr}-{solver}.partial")
            if p.exists():
                p.unlink()
            acc = pathlib.Path(
                f"{args.out}.{gstr}-{solver}.partial.acc.npz"
            )
            if acc.exists():
                acc.unlink()

    # Pivot table (eval_all.py:124-158).
    print(f"\n{'game':>6} {'solver':>6} {'full_tree':>12} {'rebel':>12}")
    for r in rows:
        reb = f"{r['rebel']:.6f}" if r["rebel"] is not None else "-"
        print(f"{r['game']:>6} {r['solver']:>6} {r['full_tree']:>12.6f} {reb:>12}")
    pathlib.Path(args.out).write_text(json.dumps(rows, indent=1))
    print(f"\nwritten: {args.out}")


if __name__ == "__main__":
    main()
