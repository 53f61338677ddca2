"""CPU smoke coverage for bench.py - the one artifact the driver executes.

Round-3 postmortem: the serving section of bench.py shipped with a calling
convention its own test suite never exercised (bare params instead of the
variables dict), crashed on the chip, and the round recorded no perf number
(VERDICT.md "What's weak" #1/#2). These tests run every ``measure_*``
section - and ``main()`` end-to-end - at tiny dims on the CPU mesh so a
convention drift between bench.py and the library fails CI, not the driver.

No reference equivalent: this guards OUR driver artifact.
"""

import json

import pytest

import bench


TINY_SLM = dict(dim=32, dim_audio=16, enc_depth=2, enc_heads=2,
                dec_depth=2, dec_heads=2, enc_max_seq_len=64,
                dec_max_seq_len=64, num_tokens=24)
TINY_VQ = dict(hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
               intermediate_size=64, zquant_dim=16, n_embed=24)


@pytest.fixture()
def tiny_bench(monkeypatch, tmp_path):
    """Shrink every bench dimension so all sections run in seconds on CPU."""
    monkeypatch.setattr(bench, "B0", 2)
    monkeypatch.setattr(bench, "N", 2)
    monkeypatch.setattr(bench, "L", 16)
    monkeypatch.setattr(bench, "CHUNK", None)
    monkeypatch.setattr(bench, "B_INDEP", 3)
    monkeypatch.setattr(bench, "TRAIN_B", 2)
    monkeypatch.setattr(bench, "TRAIN_L", 16)
    monkeypatch.setattr(bench, "SERVE_B", 2)
    monkeypatch.setattr(bench, "SERVE_C", 4)
    # measure_serving runs 1 compile + 10 timed rounds of feed(C)+generate(C)
    # plus the 1-token prompt: capacity must cover 11*C+1
    monkeypatch.setattr(bench, "SERVE_MAX", 64)
    monkeypatch.setattr(bench, "CPU_B", 1)
    monkeypatch.setattr(bench, "CPU_L", 8)
    # tiny fused-avatar section: radius 6 is the 1-layer MappingNet minimum
    monkeypatch.setattr(bench, "AVATAR", dict(
        res=16, coeff_nc=24, descriptor_nc=32, mapping_layers=1, radius=6,
        chunk=4, rounds=2))
    monkeypatch.setattr(bench, "ITERS", 1)
    monkeypatch.setattr(bench, "SLM_CFG_OVERRIDES", TINY_SLM)
    monkeypatch.setattr(bench, "VQ_CFG_OVERRIDES", TINY_VQ)
    # keep the baseline cache out of the repo root
    monkeypatch.setattr(bench, "BASELINE_FILE", str(tmp_path / "cache.json"))
    model, slm_cfg = bench._make_model()
    params = bench._init_params(model)
    return model, slm_cfg, params


def test_measure_eval_and_independent(tiny_bench):
    model, slm_cfg, params = tiny_bench
    assert bench.measure_eval_workload(model, slm_cfg, params) > 0
    assert bench.measure_independent_clips(model, slm_cfg, params) > 0


def test_measure_python_loop_and_cpu_reference(tiny_bench):
    model, slm_cfg, params = tiny_bench
    assert bench.measure_tpu_python_loop_baseline(model, slm_cfg, params,
                                                  bench.B0 * bench.N) > 0
    assert bench.measure_cpu_reference_baseline(model, slm_cfg, params) > 0


def test_measure_train_step(tiny_bench):
    del tiny_bench  # shapes come from the patched module constants
    out = bench.measure_train_step()
    assert out["train_step_frames_per_sec"] > 0
    assert out["train_step_ms"] > 0
    # the TPU-native head-shape arm (inner width 2x64=128 -> 1x128 here)
    # must run off the SAME params (round-5 shape experiment)
    assert out["train_step_ms_tpu_shape"] > 0


def test_measure_serving_accepts_bare_params(tiny_bench):
    """The exact round-3 failure: measure_serving receives the BARE params
    tree from _init_params - both the bench wrapper and the session's own
    normalization must accept it."""
    model, _, params = tiny_bench
    out = bench.measure_serving(model, params)
    assert out["serving_sessions"] == bench.SERVE_B
    assert out["serving_round_ms_p50"] > 0
    assert out["serving_frames_per_sec"] > 0


def test_measure_avatar_fused_round(tiny_bench):
    """Round-5 section: the fused live-avatar round must produce a p50 and
    a realtime verdict at tiny dims on CPU (driver-artifact coverage)."""
    model, _, params = tiny_bench
    out = bench.measure_avatar(model, params)
    assert out["avatar_round_ms_p50"] > 0
    assert out["avatar_rendered_fps"] > 0
    assert out["avatar_res"] == 16 and "avatar_realtime" in out


def test_measure_gqa_arm(tiny_bench):
    """Round-5 section: the MQA eval-workload arm builds its own
    attn_kv_heads=1 model (narrow K/V projections) and reports throughput
    plus the vs-multihead ratio when the headline exists."""
    del tiny_bench
    out = bench.measure_gqa({"value": 100.0})
    assert out["gqa_mqa_frames_per_sec"] > 0
    assert out["gqa_mqa_vs_multihead"] > 0


def test_main_emits_one_json_line(tiny_bench, capsys):
    """End-to-end: main() prints exactly ONE parseable JSON line with the
    driver-contract fields, and no section error fields on a healthy run."""
    del tiny_bench
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "listener_gen_frames_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    for key in ("independent_clips_frames_per_sec", "train_step_frames_per_sec",
                "serving_round_ms_p50", "avatar_round_ms_p50",
                "gqa_mqa_frames_per_sec"):
        assert key in rec
    assert not [k for k in rec if k.endswith("_error")]


def test_main_isolates_section_failure(tiny_bench, capsys, monkeypatch):
    """A crashing section must degrade to an error field, not sink the line
    (round 3 lost its perf record to exactly this)."""
    del tiny_bench

    def boom(*a, **k):
        raise RuntimeError("injected serving failure")

    monkeypatch.setattr(bench, "measure_serving", boom)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] > 0  # headline survived
    assert "injected serving failure" in rec["serving_error"]
    assert "serving_round_ms_p50" not in rec
