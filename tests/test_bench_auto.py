"""Control-flow tests for bench.py auto mode (the BENCH artifact builder).

Round-2's BENCH artifact was rc=124/empty because auto mode printed nothing
until every rung finished. These tests pin the restructured contract with a
mocked subprocess layer:
 - a dead backend emits an error JSON line (never hangs silently)
 - the FIRST successful rung is emitted immediately (flushed)
 - later rungs re-emit improved headlines; the LAST line is always valid
 - the wall-clock budget skips optional rungs (recorded in detail.rungs)
"""

import importlib.util
import json
import sys
import types
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class Args:
    steps = 50
    skip_vae = False
    fuse_qkv = False
    budget = 2400.0


def fake_result(step_ms, layers=42, vae_s=5.9, cfg_mode="batched"):
    clip = 50 * step_ms / 1e3 + vae_s
    return {
        "metric": "clips/min/chip (49f x 480x720, 50-step dual-stream inpaint)",
        "value": round(60.0 / clip, 4),
        "unit": "clips/min/chip",
        "vs_baseline": round(60.0 / clip / 0.125, 3),
        "detail": {"step_ms_measured": step_ms, "layers_measured": layers,
                   "cfg_mode": cfg_mode, "vae_decode_s": vae_s,
                   "int8": False, "int8_attn": False},
    }


def run_auto(bench, monkeypatch, capsys, rung_outputs, probe_ok=True,
             budget=2400.0):
    """rung_outputs: dict mapping a flag-substring -> result dict or None."""
    calls = []

    def fake_run(cmd, capture_output=True, text=True, timeout=None):
        joined = " ".join(cmd)
        res = types.SimpleNamespace(returncode=0, stdout="", stderr="")
        if "-c" in cmd:  # the watchdog probe
            if probe_ok:
                res.stdout = "OK tpu\n"
            else:
                res.returncode = 1
                res.stderr = "tunnel down"
            return res
        calls.append(joined)
        for key, out in rung_outputs.items():
            if key(joined) if callable(key) else key in joined:
                if out is None:
                    res.returncode = 1
                else:
                    res.stdout = json.dumps(out) + "\n"
                return res
        res.returncode = 1
        return res

    monkeypatch.setattr(bench.subprocess if hasattr(bench, "subprocess")
                        else __import__("subprocess"), "run", fake_run)
    args = Args()
    args.budget = budget
    bench.auto_main(args)
    out = capsys.readouterr().out
    lines = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    return lines, calls


def _is_serving(cmd):
    return "--int8" in cmd and "--int8-attn" in cmd and "--int8-pv" not in cmd


def _is_bf16_42(cmd):
    return ("--layers 42" in cmd and "--int8" not in cmd
            and "--seq-cfg" not in cmd)


def test_dead_backend_emits_error_json(bench, monkeypatch, capsys):
    lines, _ = run_auto(bench, monkeypatch, capsys, {}, probe_ok=False)
    assert len(lines) == 1
    assert lines[0]["value"] == 0.0
    assert "tpu unavailable" in lines[0]["error"]


def test_serving_rung_first_and_emitted_immediately(bench, monkeypatch, capsys):
    serving = fake_result(7583.5)
    bf16 = fake_result(8493.5, vae_s=0.0)
    lines, calls = run_auto(bench, monkeypatch, capsys, {
        _is_serving: serving, _is_bf16_42: bf16,
        "--skip-vae --int8": fake_result(8099.7, vae_s=0.0),
    })
    # first subprocess rung launched is the serving config
    assert _is_serving(calls[0])
    # first emitted line IS the serving headline (value survives to the last)
    assert lines[0]["value"] == serving["value"]
    # the headline rung name follows the committed gate artifact: with
    # GATE_int8.json + calib_ascales.npz present the static-ascale rung
    # leads; without them the dynamic-int8 rung does
    expected_first = bench._gated_serving_rungs()[0][0][0]
    assert lines[0]["detail"]["headline_rung"] == expected_first
    assert "serving_config" in lines[0]["detail"]
    # last line still the same headline, now with parity + rung log attached
    last = lines[-1]
    assert last["value"] == serving["value"]
    assert "bf16_parity_mode" in last["detail"]
    assert "int8_proj_only_mode" in last["detail"]
    assert last["detail"]["rungs"][0]["ok"] is True
    assert "total_wall_s" in last["detail"]


def test_fallback_to_bf16_then_upgrade(bench, monkeypatch, capsys):
    """Serving rung fails WITH vae but succeeds skip-vae: ladder falls to the
    bf16 batched rung for the headline, then the optional serving rung
    upgrades the headline value."""
    bf16 = fake_result(8493.5)
    serving_fast = fake_result(7583.5, vae_s=0.0)

    def key(cmd):
        return _is_serving(cmd) and "--skip-vae" not in cmd

    def key_fast(cmd):
        return _is_serving(cmd) and "--skip-vae" in cmd

    lines, calls = run_auto(bench, monkeypatch, capsys, {
        key: None, key_fast: serving_fast, _is_bf16_42: bf16,
    })
    assert lines[0]["value"] == bf16["value"]
    assert lines[0]["detail"]["headline_rung"] == "bf16_batched_42L"
    last = lines[-1]
    # upgraded: headline is now the serving config computed with bf16's vae_s
    clip = 50 * 7583.5 / 1e3 + bf16["detail"]["vae_decode_s"]
    assert last["value"] == round(60.0 / clip, 4)
    assert last["detail"]["int8_attn"] is True
    assert last["detail"]["bf16_parity_mode"]["value"] == bf16["value"]
    # failed first rung is in the log
    assert last["detail"]["rungs"][0]["ok"] is False


def test_budget_skips_optional_rungs(bench, monkeypatch, capsys):
    serving = fake_result(7583.5)
    lines, calls = run_auto(bench, monkeypatch, capsys, {
        _is_serving: serving, _is_bf16_42: fake_result(8493.5, vae_s=0.0),
    }, budget=0.0)  # budget exhausted after the (free) headline rung
    # headline still lands — it always gets the full budget
    assert lines[0]["value"] == serving["value"]
    last = lines[-1]
    skipped = [r for r in last["detail"]["rungs"] if r.get("skipped")]
    assert skipped, "optional rungs should be skipped under a spent budget"
    assert "bf16_parity_mode" not in last["detail"]


def test_all_rungs_fail_emits_error(bench, monkeypatch, capsys):
    lines, _ = run_auto(bench, monkeypatch, capsys, {})
    assert lines[-1]["value"] == 0.0
    assert "failed" in lines[-1]["error"]
    assert lines[-1]["detail"]["rungs"]


def _write_gates(path, skip_entry=None, anchor=None, robustness=None,
                 skip_raw=None):
    (path / "GATE_int8.json").write_text(json.dumps({
        "steps": 50, "layers": 42,
        "latent": {"psnr_db": 59.2}, "pixel": {"psnr_db": 57.1},
        "static_ascale": {"latent_psnr_vs_bf16_db": 58.9},
    }))
    (path / "calib_ascales.npz").write_bytes(b"x")
    if skip_raw is not None:
        (path / "GATE_skip.json").write_text(skip_raw)
        return
    gate = {"serving_mode": "int8+ascale",
            "schedules": {"4:48:4": skip_entry} if skip_entry else {}}
    if anchor:
        gate["perceptual_anchor"] = anchor
    if robustness:
        gate["robustness"] = robustness
    (path / "GATE_skip.json").write_text(json.dumps(gate))


def test_gated_rungs_perceptual_and_robustness(bench, monkeypatch, tmp_path):
    """Round-5 skip-gate eligibility: the LPIPS-vs-noise-control bound and
    the multi-seed/mask robustness legs must both hold or the skip rung is
    dropped (falling back to the no-skip ascale rung)."""
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    ok_entry = {"skipped_steps": 33, "evaluated_steps": 17,
                "latent_psnr_vs_bf16_db": 52.1, "pixel_psnr_db": 39.5,
                "lpips_vs_bf16": 0.002}
    anchor = {"lpips": 0.005}
    rob = {"schedule": "4:48:4",
           "configs": [{"seed": 1, "geom": "tall",
                        "latent_psnr_vs_bf16_db": 48.0}]}

    _write_gates(tmp_path, ok_entry, anchor, rob)
    rungs, info = bench._gated_serving_rungs()
    assert rungs[0][0] == "int8_ascale_skip_42L"
    assert info["skip_gate"]["lpips_noise35_control"] == 0.005
    assert info["skip_gate"]["robustness_min_latent_psnr_db"] == 48.0

    # LPIPS above the noise control -> skip rung dropped
    bad = dict(ok_entry, lpips_vs_bf16=0.02)
    _write_gates(tmp_path, bad, anchor, rob)
    rungs, info = bench._gated_serving_rungs()
    assert rungs[0][0] == "int8_ascale_serving_42L"

    # one robustness config below the 35 dB bar -> dropped
    rob_bad = {"schedule": "4:48:4",
               "configs": [{"seed": 2, "geom": "rect",
                            "latent_psnr_vs_bf16_db": 31.0}]}
    _write_gates(tmp_path, ok_entry, anchor, rob_bad)
    rungs, info = bench._gated_serving_rungs()
    assert rungs[0][0] == "int8_ascale_serving_42L"


def test_gate_artifacts_unreadable_is_loud(bench, monkeypatch, tmp_path):
    """Malformed gate artifacts must not silently drop rungs: a broken
    GATE_skip.json records skip_gate_error; a broken GATE_int8.json drops
    to bf16 with status 'unreadable' (GATE consumption-control rule)."""
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    _write_gates(tmp_path, skip_raw="{not json")
    rungs, info = bench._gated_serving_rungs()
    assert rungs[0][0] == "int8_ascale_serving_42L"
    assert "skip_gate_error" in info

    (tmp_path / "GATE_int8.json").write_text("{broken")
    rungs, info = bench._gated_serving_rungs()
    assert rungs == [] and info["status"] == "unreadable"


def test_gated_rungs_aggressive_schedule_needs_robustness(bench, monkeypatch,
                                                          tmp_path):
    """A schedule MORE aggressive than the robustness-gated one must not
    headline, even if its own single-config legs pass."""
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    (tmp_path / "GATE_int8.json").write_text(json.dumps({
        "latent": {"psnr_db": 59.2}, "pixel": {"psnr_db": 57.1},
        "static_ascale": {"latent_psnr_vs_bf16_db": 58.9}}))
    (tmp_path / "calib_ascales.npz").write_bytes(b"x")
    mk = lambda n, p: {"skipped_steps": n, "latent_psnr_vs_bf16_db": 52.0,
                       "pixel_psnr_db": p, "lpips_vs_bf16": 0.0002}
    (tmp_path / "GATE_skip.json").write_text(json.dumps({
        "serving_mode": "int8+ascale",
        "schedules": {"4:48:4": mk(33, 39.5), "4:48:5": mk(35, 38.4)},
        "perceptual_anchor": {"lpips": 0.0015},
        "robustness": {"schedule": "4:48:4", "configs": [
            {"seed": 1, "geom": "tall", "latent_psnr_vs_bf16_db": 53.7}]},
    }))
    rungs, info = bench._gated_serving_rungs()
    assert info["skip_gate"]["schedule"] == "4:48:4"  # not the 35-skip

    # robustness moved onto the aggressive schedule -> it becomes eligible
    (tmp_path / "GATE_skip.json").write_text(json.dumps({
        "serving_mode": "int8+ascale",
        "schedules": {"4:48:4": mk(33, 39.5), "4:48:5": mk(35, 38.4)},
        "perceptual_anchor": {"lpips": 0.0015},
        "robustness": {"schedule": "4:48:5", "configs": [
            {"seed": 1, "geom": "tall", "latent_psnr_vs_bf16_db": 52.5}]},
    }))
    rungs, info = bench._gated_serving_rungs()
    assert info["skip_gate"]["schedule"] == "4:48:5"
