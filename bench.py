"""Benchmark: 49-frame 480x720 50-step dual-stream inpainting throughput.

Prints JSON lines {"metric": ..., "value": N, "unit": ..., "vs_baseline": N};
the LAST line is the artifact. Auto mode (no --layers) emits a line after
EVERY completed rung — headline first — so a driver timeout at any point
still leaves the best-so-far result on record (round-2 lesson: the all-rungs-
then-print design produced an empty artifact under a driver timeout).

Measures the real hot path on the attached TPU chip:
 - fused branch(2L) + FULL 42-layer backbone denoise step at flagship dims
   (d=3072, 48 heads, 17,776-token joint sequence, CFG batch 2,
   Pallas flash attention) — measured, not extrapolated; params come from
   one jitted init program so the heap stays unfragmented (see CLAUDE.md)
 - headline = the FASTEST quality-gated serving config, chosen from the
   committed GATE_int8.json artifact (tools/gate_int8_flagship.py --deep):
   int8 W8A8 + int8-QK^T flash + static calibrated activation scales when
   that leg is gated (calib_ascales.npz), else dynamic int8, else bf16;
   the bf16 bit-parity path is attached as detail.bf16_parity_mode
 - VAE decode of the 13-latent-frame 60x90 grid (tiled)

clip time = 50 * step_time + decode_time; metric = clips/min/chip.
vs_baseline: BASELINE.json's north-star is <=60 s/clip on v5e-8, i.e.
0.125 clips/min/chip — vs_baseline = value / 0.125.

Usage: python bench.py [--layers N] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=0,
                    help="backbone layers to materialize (scaled to 42); "
                         "0 = auto ladder (42 -> 21 -> 8 -> 4, deepest that fits)")
    ap.add_argument("--seq-cfg", action="store_true",
                    help="sequential CFG: two B=1 forwards instead of one "
                         "CFG-batched B=2 forward — halves activation memory "
                         "so the full 42L model fits one 16 GB chip")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--tiny", action="store_true", help="smoke mode (CI)")
    ap.add_argument("--skip-vae", action="store_true")
    ap.add_argument("--fuse-qkv", action="store_true",
                    help="fold q/k/v projections into one [D,3D] matmul")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 block projections (opt-in fast mode, "
                         "~1%% relative output error; videopainter_tpu.quantize)")
    ap.add_argument("--int8-attn", action="store_true",
                    help="SageAttention-style int8-QK^T flash attention "
                         "(ops/flash_attention_int8.py; implies flash)")
    ap.add_argument("--int8-pv", action="store_true",
                    help="int8-QK^T AND int8 P·V flash attention (the "
                         "fastest, slightly lossier attention mode)")
    ap.add_argument("--int8-ascale", type=float, default=0.0,
                    help="attach a UNIFORM static activation scale to the "
                         "int8 linears (kills the per-token quantize reduce; "
                         "perf A/B only — real deployments calibrate per "
                         "layer, videopainter_tpu.quantize.attach_static_ascale)")
    ap.add_argument("--int8-scales", default=None,
                    help="attach CALIBRATED per-layer static activation "
                         "scales from this .npz (quantize.load_ascales; "
                         "produced by tools/gate_int8_flagship.py "
                         "--ascale --save-scales). The deployable static-"
                         "ascale serving config.")
    ap.add_argument("--skip-spec", default=None,
                    help='step-skip cache schedule "start:end:stride" '
                         "(pipelines.common.parse_skip_steps). Skipped steps "
                         "reuse the cached pre-CFG prediction — the clip time "
                         "becomes n_eval*step + n_skip*cached_step. Quality-"
                         "gated via GATE_skip.json "
                         "(tools/gate_skip_flagship.py).")
    ap.add_argument("--no-resident", action="store_true",
                    help="disable the resident padded sequence (per-layer "
                         "attention padding instead) — perf A/B, exact "
                         "numerics either way")
    ap.add_argument("--budget", type=float, default=3300.0,
                    help="auto-mode wall-clock budget in seconds; optional "
                         "rungs are skipped once exceeded (the headline rung "
                         "always gets the full budget). Default sized so the "
                         "dynamic-int8 comparison rung is MEASURED, not "
                         "derived (round-4 BENCH skipped it at 2400), and a "
                         "single slow-tunnel rung (>600 s observed) cannot "
                         "starve the ladder")
    args = ap.parse_args()

    if args.layers == 0 and not args.tiny:
        return auto_main(args)
    return measure_rung(args)


def _emit(obj):
    """Print one JSON line and flush — the driver parses the LAST line, so
    every emission strictly improves on the previous one and a kill at any
    point still leaves the best-so-far headline on record."""
    print(json.dumps(obj), flush=True)


_REPO = os.path.dirname(os.path.abspath(__file__))


def _gated_serving_rungs():
    """Serving rungs whose quality gate is ON RECORD, fastest first.

    Reads GATE_int8.json (written on-chip by tools/gate_int8_flagship.py
    --deep [--ascale]). A rung is eligible when its latent PSNR vs the bf16
    trajectory clears MIN_PSNR_DB and, when the decoded-pixel leg exists,
    pixel PSNR clears it too. The static-ascale rung additionally requires
    the calibrated-scales artifact (calib_ascales.npz, provenance-stamped).
    No artifact / failed gate -> [] and the ladder starts at bf16 — the
    headline is never an ungated quantized mode."""
    MIN_PSNR_DB = 35.0
    gate_path = os.path.join(_REPO, "GATE_int8.json")
    scales_path = os.path.join(_REPO, "calib_ascales.npz")
    try:
        with open(gate_path) as f:
            gate = json.load(f)
    except FileNotFoundError:
        return [], {"status": "missing",
                    "note": "GATE_int8.json absent — bf16 headline"}
    except Exception as e:  # malformed artifact: say so, don't headline int8
        return [], {"status": "unreadable",
                    "note": f"GATE_int8.json unreadable ({e!r}) — bf16 "
                            "headline; regenerate with "
                            "tools/gate_int8_flagship.py"}
    latent = gate.get("latent", {}).get("psnr_db", 0.0)
    pixel = gate.get("pixel", {}).get("psnr_db")
    info = {"status": "ok", "path": "GATE_int8.json",
            "steps": gate.get("steps"), "layers": gate.get("layers"),
            "latent_psnr_db": latent, "pixel_psnr_db": pixel,
            "min_psnr_db": MIN_PSNR_DB}
    int8_ok = latent >= MIN_PSNR_DB and (pixel is None or pixel >= MIN_PSNR_DB)
    rungs = []
    sa = gate.get("static_ascale") or {}
    sa_psnr = sa.get("latent_psnr_vs_bf16_db", 0.0)
    ascale_ok = (int8_ok and sa_psnr >= MIN_PSNR_DB
                 and os.path.exists(scales_path))
    # step-skip cache rung (fastest): requires its own gate artifact
    # (GATE_skip.json, tools/gate_skip_flagship.py — REAL denoise scan incl.
    # scheduler dynamics) on top of the int8+ascale gates it builds on. Only
    # the schedule with the decoded-pixel leg is headline-eligible.
    if ascale_ok:
        try:
            with open(os.path.join(_REPO, "GATE_skip.json")) as f:
                sgate = json.load(f)
            best = None
            anchor = sgate.get("perceptual_anchor") or {}
            rob = sgate.get("robustness") or {}
            if sgate.get("serving_mode") == "int8+ascale":
                for spec, e in (sgate.get("schedules") or {}).items():
                    # per-schedule eligibility: latent AND decoded-pixel PSNR
                    # vs the bf16 full-step trajectory both clear the bar
                    # (pixel recorded per schedule; older artifacts carried
                    # one top-level pixel leg for schedules[0])
                    pix = e.get("pixel_psnr_db")
                    if pix is None and (sgate.get("pixel") or {}).get(
                            "schedule") == spec:
                        pix = sgate["pixel"].get("psnr_db")
                    # perceptual leg (round-5 gate): LPIPS vs bf16 must not
                    # exceed the 35 dB white-noise control's LPIPS
                    if "lpips_vs_bf16" in e and "lpips" in anchor and \
                            e["lpips_vs_bf16"] > anchor["lpips"]:
                        continue
                    # robustness leg: every extra (seed, geom) config of
                    # this schedule must clear the latent bar too
                    if rob.get("schedule") == spec and any(
                            r.get("latent_psnr_vs_bf16_db", 0.0) < MIN_PSNR_DB
                            for r in rob.get("configs", [])):
                        continue
                    # when the artifact carries a robustness section, a
                    # schedule MORE aggressive than the robustness-gated one
                    # is not headline-eligible (its multi-seed/mask behavior
                    # is unverified — rerun the gate with it listed first)
                    if rob.get("configs") and rob.get("schedule") in (
                            sgate.get("schedules") or {}) and \
                            e["skipped_steps"] > sgate["schedules"][
                                rob["schedule"]]["skipped_steps"]:
                        continue
                    if (e.get("latent_psnr_vs_bf16_db", 0.0) >= MIN_PSNR_DB
                            and pix is not None and pix >= MIN_PSNR_DB
                            and (best is None or e["skipped_steps"]
                                 > best[1]["skipped_steps"])):
                        best = (spec, e, pix)
            if best:
                spec, entry, pix = best
                info["skip_gate"] = {
                    "path": "GATE_skip.json", "schedule": spec,
                    "skipped_steps": entry.get("skipped_steps"),
                    "latent_psnr_db": entry.get("latent_psnr_vs_bf16_db"),
                    "pixel_psnr_db": pix}
                if "lpips_vs_bf16" in entry:
                    info["skip_gate"]["lpips_vs_bf16"] = entry["lpips_vs_bf16"]
                    info["skip_gate"]["lpips_noise35_control"] = \
                        anchor.get("lpips")
                if rob.get("schedule") == spec and rob.get("configs"):
                    info["skip_gate"]["robustness_min_latent_psnr_db"] = min(
                        r.get("latent_psnr_vs_bf16_db", 0.0)
                        for r in rob["configs"])
                rungs.append(("int8_ascale_skip_42L",
                              ["--layers", "42", "--int8", "--int8-attn",
                               "--int8-scales", scales_path,
                               "--skip-spec", spec]))
        except FileNotFoundError:
            pass  # no skip gate on record — int8+ascale stays the fastest rung
        except Exception as e:
            # malformed/renamed gate must not SILENTLY drop the fastest rung
            # (GATE consumption-control convention: quiet no-ops are bugs)
            info["skip_gate_error"] = repr(e)
    if ascale_ok:
        info["static_ascale_psnr_db"] = sa_psnr
        rungs.append(("int8_ascale_serving_42L",
                      ["--layers", "42", "--int8", "--int8-attn",
                       "--int8-scales", scales_path]))
    if int8_ok:
        rungs.append(("int8_serving_42L",
                      ["--layers", "42", "--int8", "--int8-attn"]))
    if not rungs:
        info["status"] = "gate below threshold"
    return rungs, info


def auto_main(args):
    """Auto ladder, restructured for artifact robustness (round-2 BENCH was
    rc=124/empty): (1) a backend watchdog emits an error JSON instead of
    hanging if the TPU tunnel is down; (2) the FIRST rung is the serving
    headline (int8 W8A8 + int8-QK^T attention, WITH the VAE decode) and its
    JSON is printed+flushed the moment it lands; (3) each optional rung
    reprints an improved headline; (4) a wall-clock --budget gates optional
    rungs; (5) rung-by-rung wall times land in detail.rungs."""
    import subprocess

    t_start = time.time()
    rung_log = []

    def remaining():
        return args.budget - (time.time() - t_start)

    # --- backend watchdog: don't hang forever on a dead tunnel -------------
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print('OK', d[0].platform)"],
            capture_output=True, text=True,
            timeout=600 if args.budget > 600 else args.budget)
        probe_err = probe.stderr[-800:]
        probe_ok = probe.returncode == 0 and "OK" in probe.stdout
    except subprocess.TimeoutExpired:
        probe_err, probe_ok = "backend init timed out", False
    if not probe_ok:
        _emit({"metric": "clips/min/chip (49f x 480x720, 50-step dual-stream "
                         "inpaint)",
               "value": 0.0, "unit": "clips/min/chip", "vs_baseline": 0.0,
               "error": "tpu unavailable: backend init failed",
               "detail": {"probe_stderr": probe_err}})
        return

    def run_rung(name, extra, timeout=None):
        cmd = [sys.executable, __file__, "--steps", str(args.steps)] + \
              extra + (["--skip-vae"] if args.skip_vae else []) + \
              (["--fuse-qkv"] if args.fuse_qkv else [])
        t0 = time.time()
        out = None
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout)
            lines = [l for l in res.stdout.splitlines() if l.startswith("{")]
            if res.returncode == 0 and lines:
                out = json.loads(lines[-1])
        except subprocess.TimeoutExpired:
            pass
        rung_log.append({"rung": name, "wall_s": round(time.time() - t0, 1),
                         "ok": out is not None})
        return out

    metric = "clips/min/chip (49f x 480x720, 50-step dual-stream inpaint)"

    # --- rung 1: the serving headline, self-contained (incl. VAE decode) ---
    # The headline is the FASTEST serving config whose quality gate has been
    # run and recorded (GATE_int8.json, written on-chip by
    # tools/gate_int8_flagship.py --deep [--ascale]): int8 + static
    # calibrated activation scales if that leg is gated and calib_ascales.npz
    # is present, else dynamic int8, else bf16. Run it FIRST so a driver kill
    # after one rung still records the headline; fall down the ladder on
    # failure.
    serving_note = (
        "int8 W8A8 block projections + int8-QK^T flash attention; "
        "flagship-dims quality gate vs bf16 trajectory: "
        "tools/gate_int8_flagship.py (GATE_int8.json)")
    gated_rungs, gate_info = _gated_serving_rungs()
    ladder = gated_rungs + [
        ("bf16_batched_42L", ["--layers", "42"]),
        ("bf16_seqcfg_42L", ["--layers", "42", "--seq-cfg"]),
        ("bf16_21L", ["--layers", "21"]),
        ("bf16_8L", ["--layers", "8"]),
        ("bf16_4L", ["--layers", "4"]),
    ]
    headline = None
    headline_name = None
    for name, extra in ladder:
        headline = run_rung(name, extra, timeout=max(remaining(), 600.0))
        if headline:
            headline_name = name
            break
        if remaining() < 300:  # keep enough budget for at least one retry
            break
    if headline is None:
        _emit({"metric": metric, "value": 0.0, "unit": "clips/min/chip",
               "vs_baseline": 0.0,
               "error": "all bench ladder rungs failed within budget",
               "detail": {"rungs": rung_log}})
        return
    headline["detail"]["headline_rung"] = headline_name
    if headline_name == "int8_ascale_skip_42L":
        headline["detail"]["serving_config"] = serving_note + \
            " + STATIC calibrated activation scales (calib_ascales.npz)" + \
            " + step-skip cache (GATE_skip.json)"
    elif headline_name == "int8_ascale_serving_42L":
        headline["detail"]["serving_config"] = serving_note + \
            " + STATIC calibrated activation scales (calib_ascales.npz)"
    elif headline_name == "int8_serving_42L":
        headline["detail"]["serving_config"] = serving_note
    headline["detail"]["quality_gate"] = gate_info
    headline["detail"]["rungs"] = rung_log
    _emit(headline)  # first artifact is on record NOW
    vae_s = headline["detail"].get("vae_decode_s") or 0.0
    if headline_name == "int8_ascale_skip_42L":
        # derived, no extra chip time: the same measured step with no steps
        # skipped IS the int8+ascale serving mode
        d = headline["detail"]
        noskip_clip = args.steps * d["step_ms_measured"] / 1e3 + vae_s
        d["int8_static_ascale_mode"] = {
            "step_ms_measured": d["step_ms_measured"],
            "layers_measured": d["layers_measured"],
            "cfg_mode": d["cfg_mode"],
            "clips_per_min_per_chip": round(60.0 / noskip_clip, 4),
            "vs_baseline": round(60.0 / noskip_clip / 0.125, 3),
            "note": "same measured step, all 50 steps evaluated (derived "
                    "from the skip rung's step measurement)",
        }

    # --- optional rungs: attach comparison modes, reprint after each -------
    def attach(key, name, extra, note, est_s=900.0):
        if remaining() < est_s:
            rung_log.append({"rung": name, "ok": False,
                             "skipped": "budget exhausted"})
            headline["detail"]["rungs"] = rung_log
            return None
        fast = run_rung(name, ["--layers", "42", "--skip-vae"] + extra,
                        timeout=remaining())
        if fast:
            fclip = args.steps * fast["detail"]["step_ms_measured"] / 1e3 \
                + vae_s
            headline["detail"][key] = {
                "step_ms_measured": fast["detail"]["step_ms_measured"],
                "layers_measured": fast["detail"]["layers_measured"],
                "cfg_mode": fast["detail"]["cfg_mode"],
                "clips_per_min_per_chip": round(60.0 / fclip, 4),
                "vs_baseline": round(60.0 / fclip / 0.125, 3),
                "note": note,
            }
        headline["detail"]["rungs"] = rung_log
        _emit(headline)
        return headline["detail"].get(key)

    if headline_name in ("int8_ascale_skip_42L", "int8_ascale_serving_42L",
                         "int8_serving_42L"):
        # headline already is a serving config; attach bf16 parity + extras
        attach("bf16_parity_mode", "bf16_batched_42L", [],
               "full-precision bf16 path (golden-parity mode)")
        attach("int8_proj_only_mode", "int8_proj_42L", ["--int8"],
               "W8A8 projections with bf16 attention")
        if headline_name in ("int8_ascale_skip_42L",
                             "int8_ascale_serving_42L"):
            attach("int8_dynamic_mode", "int8_serving_42L",
                   ["--int8", "--int8-attn"],
                   "serving config with per-token DYNAMIC activation "
                   "quantize (no calibrated scales needed)")
        else:
            # static activation scales: perf A/B for the calibrated mode —
            # the graph is identical for uniform vs calibrated [L] scales, so
            # a uniform value measures the speedup; quality is gated
            # separately (tools/gate_int8_flagship.py --ascale)
            attach("int8_static_ascale_mode", "int8_ascale_42L",
                   ["--int8", "--int8-attn", "--int8-ascale", "0.02"],
                   "serving config with STATIC activation scales (per-token "
                   "quantize reduce removed; quantize.attach_static_ascale)")
    else:
        # bf16 (or smaller) headline landed first; try to upgrade to the
        # serving config if its 42L rung fits in the remaining budget
        fast = attach("int8_full_fast_mode", "int8_serving_42L",
                      ["--int8", "--int8-attn"], serving_note)
        if fast and fast.get("layers_measured") == 42:
            headline["detail"]["bf16_parity_mode"] = {
                "value": headline["value"],
                "vs_baseline": headline["vs_baseline"],
                "step_ms_measured": headline["detail"]["step_ms_measured"],
                "cfg_mode": headline["detail"]["cfg_mode"],
                "note": "full-precision bf16 path (golden-parity mode)",
            }
            headline["value"] = fast["clips_per_min_per_chip"]
            headline["vs_baseline"] = fast["vs_baseline"]
            headline["detail"]["step_ms_measured"] = fast["step_ms_measured"]
            headline["detail"]["int8"] = True
            headline["detail"]["int8_attn"] = True
            headline["detail"]["serving_config"] = serving_note
            _emit(headline)

    headline["detail"]["total_wall_s"] = round(time.time() - t_start, 1)
    headline["detail"]["rungs"] = rung_log
    _emit(headline)


def measure_rung(args):
    import jax

    try:  # persistent compile cache: repeat runs skip the slow remote compile
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_vp_bench"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from videopainter_tpu.config import BranchConfig, TransformerConfig, VAEConfig
    from videopainter_tpu.models import (AutoencoderKLCogVideoX, CogVideoXBranch,
                                         CogVideoXTransformer3D)
    from videopainter_tpu.pipelines.common import prepare_rope

    full_layers = 42
    if args.tiny:
        cfg = TransformerConfig.tiny(in_channels=32, out_channels=16,
                                     sample_height=8, sample_width=12)
        full_layers = cfg.num_layers
        H_lat, W_lat, T_lat, text_len, text_dim = 8, 12, 3, 5, 12
    else:
        cfg = TransformerConfig.cogvideox_5b_i2v(num_layers=args.layers)
        H_lat, W_lat, T_lat, text_len, text_dim = 60, 90, 13, 226, 4096

    bcfg = BranchConfig.from_transformer(cfg, num_layers=2)
    transformer = CogVideoXTransformer3D(cfg)
    branch = CogVideoXBranch(bcfg)

    dtype = jnp.bfloat16

    # ONE jitted init program: outputs are buffer-assigned compactly, so the
    # heap stays defragmented and the 42L forward's contiguous temp arena
    # fits. Eager per-leaf init interleaves f32 temps with params and OOMs
    # the 42L forward at runtime despite a 13.2 GiB compiled peak.
    # The sincos pos table rides in as an ARGUMENT — as a baked constant the
    # [1,17776,3072] table overflows the axon remote-compile request (413).
    @jax.jit
    def _build(k0, k1, pos):
        tp = transformer.init(k0, dtype=dtype, pos_embedding=pos)
        bp = branch.init_from_transformer(k1, tp, cfg, dtype=dtype)
        return {"transformer": tp, "branch": bp}

    params = _build(jax.random.PRNGKey(0), jax.random.PRNGKey(1),
                    transformer.host_pos_embedding())
    jax.block_until_ready(params)
    if args.fuse_qkv:
        from videopainter_tpu.ops.attention import fuse_qkv_projections

        params = {k: fuse_qkv_projections(v) for k, v in params.items()}
    if args.int8:
        from videopainter_tpu.quantize import quantize_transformer_int8

        # free_source: at 42L the bf16 stack is ~11.3 GiB of a ~13 GiB-usable
        # chip — the int8 copy can only be built if sources are freed as it goes
        params = {k: quantize_transformer_int8(v, free_source=True)
                  for k, v in params.items()}
        if args.int8_scales:
            from videopainter_tpu.quantize import (attach_static_ascale,
                                                   load_ascales)

            scales = load_ascales(args.int8_scales)
            params = {k: attach_static_ascale(v, scales[k])
                      if k in scales else v for k, v in params.items()}
        elif args.int8_ascale:
            from videopainter_tpu.quantize import attach_static_ascale

            params = {k: attach_static_ascale(v, args.int8_ascale)
                      for k, v in params.items()}

    B = 1
    lat_shape = (B, T_lat, H_lat, W_lat, 16)
    gen = jax.jit(lambda k, s=lat_shape: jax.random.normal(k, s, dtype=dtype))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    latents, masked = gen(keys[0]), gen(keys[1])
    image_latents = jnp.zeros(lat_shape, dtype)
    mask = (jax.random.uniform(keys[2], (B, T_lat, H_lat, W_lat)) > 0.5).astype(dtype)
    embeds = jax.random.normal(keys[3], (2 * B, text_len, text_dim), dtype=dtype)
    rope = prepare_rope(cfg, H_lat * 8, W_lat * 8, T_lat, 8)
    rope = (rope[0].astype(dtype), rope[1].astype(dtype))

    use_flash = ("int8pv" if args.int8_pv else
                 "int8" if args.int8_attn else (not args.tiny))

    # None = the models' measured auto rule (int8 modes non-resident, bf16
    # resident); --no-resident forces the per-layer padding for A/Bs
    resident = False if args.no_resident else None

    def forward_one(params, latents, masked, image_latents, mask, embeds_b,
                    rope, ts):
        model_in = jnp.concatenate([latents, image_latents], axis=-1)
        cond = jnp.concatenate([masked, mask[..., None]], axis=-1)
        samples = branch.apply(params["branch"], latents, embeds_b, cond, ts,
                               rope=rope, use_flash=use_flash,
                               resident=resident)
        out = transformer.apply(params["transformer"], model_in, embeds_b, ts,
                                rope=rope, branch_block_samples=samples,
                                branch_block_masks=mask, use_flash=use_flash,
                                resident=resident)
        return out.sample

    def denoise_step(params, latents, masked, image_latents, mask, embeds,
                     rope, t):
        # all arrays are jit ARGS, not closures - closed-over arrays embed as
        # MLIR constants, whose host fetch OOMs when HBM is near-full (42L)
        lvi = jnp.concatenate([latents, latents], axis=0)
        ts = jnp.broadcast_to(t, (2 * B,))
        out = forward_one(
            params, lvi,
            jnp.concatenate([masked] * 2, axis=0),
            jnp.concatenate([image_latents] * 2, axis=0),
            jnp.concatenate([mask] * 2, axis=0), embeds, rope, ts)
        u, c = jnp.split(out.astype(jnp.float32), 2, axis=0)
        pred = u + 6.0 * (c - u)
        return (latents.astype(jnp.float32) * 0.99 - 0.01 * pred).astype(dtype)

    def combine(latents, u, c):
        pred = u.astype(jnp.float32) + 6.0 * (c - u).astype(jnp.float32)
        return (latents.astype(jnp.float32) * 0.99 - 0.01 * pred).astype(dtype)

    if args.seq_cfg:
        # sequential CFG: uncond and cond as SEPARATE B=1 dispatches — each
        # call's activation temps are freed at call exit and only the bf16
        # outputs persist, so the full 42L model fits one 16 GB chip (the
        # one-program CFG-batched variant exceeds HBM by design: a second
        # forward's temps coexist with the first's fp32 residual)
        fwd = jax.jit(
            lambda params, latents, masked, image_latents, mask, e, rope, ts:
            forward_one(params, latents, masked, image_latents, mask, e,
                        rope, ts))
        comb = jax.jit(combine, donate_argnums=(0, 1, 2))
        eu, ec = embeds[:B], embeds[B:]

        def step(params, latents, masked, image_latents, mask, embeds, rope, t):
            ts = jnp.broadcast_to(t, (B,))
            u = fwd(params, latents, masked, image_latents, mask, eu, rope, ts)
            c = fwd(params, latents, masked, image_latents, mask, ec, rope, ts)
            return comb(latents, u, c)
    else:
        step = jax.jit(denoise_step, donate_argnums=(1,))
    sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    t0 = time.time()
    latents2 = step(params, latents, masked, image_latents, mask, embeds,
                    rope, jnp.asarray(500))
    float(sync(latents2))
    compile_time = time.time() - t0

    reps = 2 if args.tiny else 3
    t0 = time.time()
    cur = latents2
    for i in range(reps):
        cur = step(params, cur, masked, image_latents, mask, embeds, rope,
                   jnp.asarray(500 - i))
    float(sync(cur))
    step_time = (time.time() - t0) / reps
    full_step_time = step_time * (full_layers + 2) / (cfg.num_layers + 2)

    n_skip, cached_step_time = 0, 0.0
    if args.skip_spec:
        # step-skip cache rung: a skipped step reuses the cached pre-CFG
        # prediction, so its cost is the scheduler/CFG update alone. Measured
        # here as its own dispatch — conservative vs the real fused scan,
        # where skipped steps run INSIDE the device program with no dispatch
        # overhead at all (tools/gate_skip_flagship.py records the real scan
        # wall times).
        from videopainter_tpu.pipelines.common import parse_skip_steps

        n_skip = len(parse_skip_steps(args.skip_spec, args.steps))
        u = jax.random.normal(jax.random.PRNGKey(5), lat_shape, dtype=dtype)
        c = jax.random.normal(jax.random.PRNGKey(6), lat_shape, dtype=dtype)
        cached = jax.jit(combine)
        float(sync(cached(cur, u, c)))  # compile
        t0 = time.time()
        x = cur
        for _ in range(10):
            x = cached(x, u, c)
        float(sync(x))
        cached_step_time = (time.time() - t0) / 10

    decode_time = 0.0
    if not args.skip_vae and not args.tiny:
        # free the DiT params before the VAE leg: both stacks resident would
        # exceed one chip's HBM (deployment overlaps them across windows on
        # separate chips instead)
        del params, latents, latents2, cur, masked, image_latents, embeds
        import gc

        gc.collect()
        vae = AutoencoderKLCogVideoX(VAEConfig())
        vae.enable_tiling()
        vparams = vae.init(jax.random.PRNGKey(3), dtype=dtype)
        z = jax.random.normal(jax.random.PRNGKey(4), (1, 13, 60, 90, 16), dtype=dtype)
        y = vae.decode(vparams, z)
        float(jnp.sum(y.astype(jnp.float32)))  # compile+run
        t0 = time.time()
        y = vae.decode(vparams, z)
        float(jnp.sum(y.astype(jnp.float32)))
        decode_time = time.time() - t0

    clip_time = (args.steps - n_skip) * full_step_time \
        + n_skip * cached_step_time + decode_time
    clips_per_min_per_chip = 60.0 / clip_time
    baseline = 1.0 / (60.0 / 60.0 * 8)  # 60 s/clip on 8 chips -> clips/min/chip

    result = {
        "metric": "clips/min/chip (49f x 480x720, 50-step dual-stream inpaint)",
        "value": round(clips_per_min_per_chip, 4),
        "unit": "clips/min/chip",
        "vs_baseline": round(clips_per_min_per_chip / baseline, 3),
        "detail": {
            "step_ms_measured": round(step_time * 1e3, 1),
            "layers_measured": cfg.num_layers,
            "cfg_mode": "sequential" if args.seq_cfg else "batched",
            "int8": args.int8,
            "int8_attn": args.int8_attn,
            "int8_scales": (os.path.basename(args.int8_scales)
                            if args.int8_scales else None),
            "skip_spec": args.skip_spec,
            "skipped_steps": n_skip or None,
            "cached_step_ms": (round(cached_step_time * 1e3, 1)
                               if n_skip else None),
            # flash block sweep history (round 1, S=17776 d=64): best 512x2048
            # @ ~55-61 TF/s; tried 256x1024/512x1024/512x4096/808x1616/
            # 1024x2048 (slower), 1024x4096/2048x2048/1616x1616 (fail compile/
            # VMEM). Do NOT re-sweep; d=64 MXU underfill caps ~98 TF/s.
            "flash_blocks": "512x2048 (swept r1, see note)",
            "step_ms_extrapolated_42L": round(full_step_time * 1e3, 1),
            "vae_decode_s": round(decode_time, 2),
            "vae_decode_fps": round(49.0 / decode_time, 1) if decode_time else None,
            "clip_s": round(clip_time, 1),
            "compile_s": round(compile_time, 1),
        },
    }
    _emit(result)


if __name__ == "__main__":
    main()
