#!/usr/bin/env python
"""Headline benchmark: CFR subgame-iterations/s per chip at 1x4f.

Measures the self-play hot path — batched depth-2 subgame solving with
the CFV MLP fused into the iteration loop (the TPU-native equivalent of
the reference's gen_benchmark,
/root/reference/csrc/liars_dice/gen_benchmark.cc) — and prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference implementation publishes no numbers
(BASELINE.md).  We measured its data-generation hot loop on this host
via tools/golden/ref_bench (RlRunner + zero-output net, single core) and
scale by the 60 CPU generation threads of the production config
(README.md:44-53); a zero net is strictly faster than the reference's
real MLP inference path, so this over-estimates the reference.  See
tools/golden/REF_BASELINE.json for the measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: first TPU compile goes through a slow
# remote-compile tunnel in this environment; cache across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_BASELINE_PATH = pathlib.Path(__file__).parent / "tools/golden/REF_BASELINE.json"

# Peak dense-matmul throughput per chip for MFU, keyed by substrings of
# jax's device_kind (bf16 FLOP/s; public TPU spec-sheet numbers).
PEAK_BF16_FLOPS = {
    "v6": 918e12,
    "v5p": 459e12,
    "v5": 197e12,      # v5e / "v5 lite" (matched after v5p)
    "v4": 275e12,
}


def device_peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for key, peak in PEAK_BF16_FLOPS.items():
        if key in kind:
            return peak
    return None


def mlp_model_flops_per_subgame_iter(num_dice: int, num_faces: int,
                                     n_hidden: int = 256,
                                     n_layers: int = 2) -> int:
    """Model FLOPs of the fused CFV-MLP leaf evaluation per subgame per
    solver iteration (the MXU-dominant work; the VPU solver update is
    O(hands*actions) and negligible at these sizes).

    One iteration evaluates the net on every non-terminal depth-2
    pseudo-leaf: the (a1, a2) bid pairs with a1 < a2 and neither the
    liar call (grid2p.Grid2PallasSolver.__post_init__), i.e.
    C(num_actions-1, 2) queries.  Per query the MLP is
    in -> n_layers x n_hidden -> num_hands with in = 2 + num_actions +
    2*num_hands (subgame_solving.cc:100-123).  Counted without MXU tile
    padding (standard model-FLOPs MFU convention); the 19-wide input
    layer pads to 128 lanes on hardware, so the MXU-busy fraction is
    higher than the reported MFU."""
    num_actions = 1 + 2 * num_dice * num_faces
    num_hands = num_faces ** num_dice
    n_bids = num_actions - 1
    pseudo_leaves = n_bids * (n_bids - 1) // 2
    d_in = 2 + num_actions + 2 * num_hands
    per_query = 2 * (
        d_in * n_hidden
        + (n_layers - 1) * n_hidden * n_hidden
        + n_hidden * num_hands
    )
    return pseudo_leaves * per_query


def measure(batch: int, num_iters: int, steps: int, warmup: int = 1,
            layout: str = "batch_last", no_net: bool = False,
            lane_block: int = 128, mlp_chunks: int = 1,
            ablate: str = "", gelu: str = "auto", use_cfr: bool = True,
            interleave: int = 1):
    from rebel_tpu.nets.cfv_net import CFVNetSpec
    from rebel_tpu.selfplay.fast_runner import FastBatchedEngine, make_engine
    from rebel_tpu.selfplay.runner import EpisodeState, RecursiveSolvingParams
    from rebel_tpu.solving.params import SubgameSolvingParams

    cfg = RecursiveSolvingParams(
        num_dice=1,
        num_faces=4,
        subgame_params=SubgameSolvingParams(
            num_iters=num_iters, max_depth=2, linear_update=True,
            use_cfr=use_cfr
        ),
        random_action_prob=0.25,
        sample_leaf=True,
    )
    spec_dtype = jnp.bfloat16
    if layout == "batch_last":
        engine = FastBatchedEngine(
            cfg=cfg, dtype=jnp.float32, net_compute_dtype=spec_dtype
        )
    elif layout == "pallas":
        from rebel_tpu.selfplay.fast_runner import FastPallasEngine

        engine = FastPallasEngine(
            cfg=cfg, dtype=jnp.float32, net_compute_dtype=spec_dtype,
            lane_block=lane_block, mlp_chunks=mlp_chunks, ablate=ablate,
            gelu=gelu, interleave=interleave,
        )
    else:
        engine = make_engine(cfg, dtype=jnp.float32)
    spec = CFVNetSpec(game=engine.game, compute_dtype=spec_dtype)
    params = spec.init_params(jax.random.PRNGKey(0))
    if no_net:
        # Diagnostic: solver-only cost (the MLP + query assembly is
        # dead-code-eliminated when no params are passed).
        net_arg = None
    else:
        net_arg = (
            params
            if getattr(engine, "wants_params", False)
            else spec.value_fn(params)
        )

    eps = EpisodeState.initial_batch(engine.game, batch, jnp.float32)
    step = jax.jit(lambda e, k: engine.batch_step(e, k, net_arg))

    import numpy as np

    key = jax.random.PRNGKey(1)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        eps, out = step(eps, jax.random.split(sub, batch))
    # Hard device-to-host fetch: block_until_ready is not a reliable
    # execution barrier on the tunneled backend in this environment.
    float(np.asarray(out.values).sum())

    # Pre-split the per-step key batches outside the timed region: in
    # production the key derivation is fused inside the jitted
    # gen+train program, but here each jax.random.split is a separate
    # tiny device op whose tunnel round-trip (~10 ms on this backend)
    # would be charged to the engine.  The timed loop then dispatches
    # the steps back-to-back and blocks once at the end.
    step_keys = []
    for _ in range(steps):
        key, sub = jax.random.split(key)
        step_keys.append(jax.random.split(sub, batch))
    jax.block_until_ready(step_keys)
    t0 = time.perf_counter()
    for k in step_keys:
        eps, out = step(eps, k)
    checksum = float(np.asarray(out.values).sum())
    wall = time.perf_counter() - t0
    assert np.isfinite(checksum)

    subgames = batch * steps
    return {
        "wall_s": wall,
        "subgames_per_s": subgames / wall,
        "cfr_iters_per_s": subgames * num_iters / wall,
        "examples_per_s": 2 * subgames / wall,
    }


# Capture-robustness state (round-4 postmortem: BENCH_r04 was rc=124
# with *nothing* printed because the first JSON line only came after the
# side measurements).  The headline JSON now prints immediately after
# the headline measurement; a watchdog bounds the whole run (the
# jax.devices() probe alone cannot catch a compile/execute hang on the
# tunneled backend); SIGTERM/ALRM emit whatever has been measured.
_progress = {"stage": "startup", "headline": None}


def _emit_partial(reason: str):
    head = _progress["headline"]
    line = {
        "metric": "CFR subgame-iters/s per chip (1x4f, depth-2, CFV net fused)",
        "value": head["value"] if head else None,
        "unit": "iters/s",
        "vs_baseline": head["vs_baseline"] if head else None,
        "error": f"{reason} (stage: {_progress['stage']})",
    }
    print(json.dumps(line), flush=True)


def _install_watchdogs(deadline_s: float):
    import signal
    import threading

    def _expire():
        _emit_partial(f"watchdog expired after {deadline_s:.0f}s")
        os._exit(3)

    timer = threading.Timer(deadline_s, _expire)
    timer.daemon = True
    timer.start()

    def _on_term(signum, frame):
        _emit_partial(f"killed by signal {signum}")
        os._exit(4)

    signal.signal(signal.SIGTERM, _on_term)
    return timer


def main():
    ap = argparse.ArgumentParser()
    # 8192 lanes is the measured sweet spot on a v5e chip (see
    # results/SCALING.md lane sweep: 9.76M iters/s vs 9.55M at 4096).
    # 16384 lanes: throughput saturates from ~512 lanes (SCALING.md),
    # but the longer device step amortizes the tunneled per-step
    # dispatch (~17 ms) — 9.87M vs 9.76M iters/s at 8192 on the same
    # chip/session, against a constant 9.95M device-side rate.
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--num_iters", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--smoke", action="store_true", help="tiny fast run")
    ap.add_argument(
        "--cycles", type=int, default=0,
        help="gen_benchmark mode: print items/per_second every cycle "
        "(gen_benchmark.cc:147-153)",
    )
    ap.add_argument(
        "--profile", default=None,
        help="write a jax.profiler trace to this directory",
    )
    ap.add_argument(
        "--layout", default="pallas",
        choices=("batch_last", "batch_first", "pallas"),
    )
    ap.add_argument("--no-net", action="store_true",
                    help="diagnostic: solver-only (MLP elided)")
    # Best measured config on v5e (see results/KERNEL_TUNING.md):
    # 256 lanes per program, MLP in 4 column chunks.
    ap.add_argument("--lane-block", type=int, default=256)
    ap.add_argument("--mlp-chunks", type=int, default=4)
    ap.add_argument(
        "--interleave", type=int, default=1,
        help="2 = software-pipeline two half lane-blocks to overlap the "
        "MLP (MXU) with the solve update (VPU); CFR+net only")
    ap.add_argument("--ablate", default="",
                    choices=("", "nogelu", "noln", "cheaperf"),
                    help="kernel perf diagnostics (see Grid2PallasSolver)")
    ap.add_argument("--fp", action="store_true",
                    help="measure the FP (fictitious play) solver "
                    "instead of CFR")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the FP and no-net side measurements "
                    "(the default full run records all three modes in "
                    "one JSON line)")
    ap.add_argument("--gelu", default="auto",
                    choices=("auto", "exact", "fast"),
                    help="GELU policy for the pallas fast path")
    ap.add_argument(
        "--deadline", type=float, default=540.0,
        help="hard wall-clock bound in seconds; on expiry a partial "
        "JSON line is printed and the process exits (0 disables). "
        "Covers compile and execute, not just backend discovery.")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.num_iters, args.steps = 64, 32, 2

    if args.deadline and not (args.cycles or args.profile):
        _install_watchdogs(args.deadline)
    else:
        # No hard deadline for profiling/cycles runs, but still emit a
        # partial line if the driver SIGTERMs one.
        import signal

        signal.signal(
            signal.SIGTERM,
            lambda s, f: (_emit_partial(f"killed by signal {s}"),
                          os._exit(4)),
        )

    # A dead remote-device tunnel blocks jax.devices() in native code
    # forever (observed live).  Probe it from a daemon thread so an
    # unreachable backend produces one explicit JSON error line instead
    # of a silent hang.
    import threading

    backend_ok = threading.Event()

    def _probe():
        try:
            jax.devices()
            backend_ok.set()
        except Exception:
            pass

    _progress["stage"] = "backend probe"
    threading.Thread(target=_probe, daemon=True).start()
    if not backend_ok.wait(timeout=240):
        print(
            json.dumps(
                {
                    "metric": "cfr_subgame_iters_per_s",
                    "value": None,
                    "unit": "iters/s",
                    "vs_baseline": None,
                    "error": "device backend unreachable after 240s",
                }
            )
        )
        raise SystemExit(1)

    kw = dict(no_net=args.no_net, lane_block=args.lane_block,
              interleave=args.interleave,
              mlp_chunks=args.mlp_chunks, ablate=args.ablate,
              gelu=args.gelu, use_cfr=not args.fp)
    if args.profile:
        jax.profiler.start_trace(args.profile)
    if args.cycles:
        # Periodic reporting like the reference's datagen benchmark.
        total_items = 0
        t_start = time.perf_counter()
        for cycle in range(args.cycles):
            r = measure(args.batch, args.num_iters, args.steps,
                        warmup=1 if cycle == 0 else 0, layout=args.layout,
                        **kw)
            total_items += int(r["examples_per_s"] * r["wall_s"])
            elapsed = time.perf_counter() - t_start
            print(
                f"cycle {cycle}: items {total_items} "
                f"per_second {total_items / elapsed:.2f}"
            )
    _progress["stage"] = "headline compile+measure"
    try:
        res = measure(
            args.batch, args.num_iters, args.steps, layout=args.layout, **kw
        )
    except Exception as e:  # pallas/Mosaic toolchain hiccup: fall back
        if args.layout == "batch_first":
            raise
        if args.no_net:
            # Only the fused Pallas kernel dead-code-eliminates the MLP;
            # the XLA grid engines require a value_fn for depth-2
            # subgames (grid2.py), so a --no-net fallback cannot run.
            print("# layout failed and --no-net has no batch_first "
                  "equivalent; aborting", flush=True)
            raise
        print(f"# layout {args.layout} failed ({type(e).__name__}); "
              "falling back to batch_first", flush=True)
        args.layout = "batch_first"
        res = measure(
            args.batch, args.num_iters, args.steps, layout=args.layout, **kw
        )
    if args.profile:
        jax.profiler.stop_trace()

    side = {}
    vs_baseline = None
    # The recorded reference baseline is CFR-only; an FP/CFR ratio
    # would be meaningless. Configuration-matched comparison
    # (REF_BASELINE.json, both sides at -O3 -march=native x60 threads):
    # the default fused-net bench compares against the reference
    # running its real TorchScript net per iteration (its production
    # cpu_gen_threads mode, README.md:36-44); --no-net compares the
    # bare solver loop against the reference's zero-net bound.
    vs_zero_net_ref = None
    zn = None
    if REF_BASELINE_PATH.exists() and not args.fp:
        ref = json.loads(REF_BASELINE_PATH.read_text())
        base = ref.get(
            "zero_net_cfr_iters_per_s_60threads"
            if args.no_net
            else "cfr_iters_per_s_60threads"
        )
        if base:
            vs_baseline = res["cfr_iters_per_s"] / base
        # Transparency: also report the strictest cross-config ratio —
        # this kernel (net fused, evaluated every iteration) against the
        # reference's *zero-net* 60-thread bound, i.e. our full workload
        # vs their free-leaf upper bound.
        zn = ref.get("zero_net_cfr_iters_per_s_60threads")
        if zn and not args.no_net:
            vs_zero_net_ref = round(res["cfr_iters_per_s"] / zn, 2)

    # Roofline: achieved model FLOP/s of the fused MLP (the MXU work)
    # and MFU against the chip's bf16 peak.  No extra device work — this
    # rides the headline measurement, so it goes in the first line.
    dev = jax.devices()[0]
    if not args.no_net:
        flops_it = mlp_model_flops_per_subgame_iter(1, 4)
        achieved = res["cfr_iters_per_s"] * flops_it
        side["mlp_model_flops_per_s"] = round(achieved / 1e12, 2)
        side["mlp_model_flops_unit"] = "TFLOP/s (bf16, unpadded)"
        peak = device_peak_flops(dev)
        if peak:
            side["mfu"] = round(achieved / peak, 4)
            side["peak_bf16_tflops_assumed"] = peak / 1e12

    def headline_line():
        return {
            "metric": ("FP" if args.fp else "CFR")
            + " subgame-iters/s per chip (1x4f, depth-2, CFV net fused)",
            "value": round(res["cfr_iters_per_s"], 1),
            "unit": "iters/s",
            "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            "baseline_config": (
                None if args.fp else
                "ref -O3 60-thread bound, "
                + ("zero net" if args.no_net else "TorchScript net")
            ),
            "detail": {
                "vs_zero_net_ref_bound": vs_zero_net_ref,
                "subgames_per_s": round(res["subgames_per_s"], 1),
                "examples_per_s": round(res["examples_per_s"], 1),
                "batch": args.batch,
                "num_iters": args.num_iters,
                "wall_s": round(res["wall_s"], 2),
                "device": str(jax.devices()[0]),
                "device_kind": getattr(dev, "device_kind", None),
                **side,
            },
        }

    # Print the headline IMMEDIATELY: round 4 lost its capture to a
    # hang during the (optional) side measurements below, after which
    # nothing had been printed.  If the sides complete, a second,
    # superset line with identical headline values follows — a tail
    # parser picking either line records the same measurement.
    _progress["headline"] = headline_line()
    print(json.dumps(_progress["headline"]), flush=True)

    # Side measurements for the record: FP-mode and solver-only
    # throughput next to the CFR headline (the reference's
    # gen_benchmark measures only its production config,
    # gen_benchmark.cc:147-153).  Skipped when the caller already
    # narrowed the run to one mode.
    if not (args.headline_only or args.fp or args.no_net or args.smoke):
        side_steps = max(1, args.steps // 2)
        _progress["stage"] = "side measurement: fp"
        try:
            r_fp = measure(args.batch, args.num_iters, side_steps,
                           layout=args.layout,
                           **{**kw, "use_cfr": False})
            side["fp_iters_per_s"] = round(r_fp["cfr_iters_per_s"], 1)
        except Exception as e:
            side["fp_iters_per_s"] = f"failed: {type(e).__name__}"
        _progress["stage"] = "side measurement: no-net"
        try:
            r_nn = measure(args.batch, args.num_iters, side_steps,
                           layout=args.layout, **{**kw, "no_net": True})
            side["no_net_cfr_iters_per_s"] = round(
                r_nn["cfr_iters_per_s"], 1)
            if zn:
                side["no_net_vs_zero_net_ref"] = round(
                    r_nn["cfr_iters_per_s"] / zn, 2)
        except Exception as e:
            side["no_net_cfr_iters_per_s"] = f"failed: {type(e).__name__}"
        _progress["stage"] = "done"
        print(json.dumps(headline_line()), flush=True)


if __name__ == "__main__":
    main()
