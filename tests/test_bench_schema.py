"""Guardrails for the bench JSON contract (VERDICT round-4 items 1 and 7):
the realistic-workload composition math and the report schema are pure
functions in bench.py — test them without touching a chip."""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_len_cdf_parse_and_validate(bench):
    cdf = bench.parse_len_cdf("32:0.9,64:0.98")
    assert cdf == ((32, 0.9), (64, 0.98), (128, 1.0))
    with pytest.raises(ValueError):
        bench.parse_len_cdf("32:0.9,64:0.5")  # non-monotone
    with pytest.raises(ValueError):
        bench.parse_len_cdf("32:1.5")


def test_batch_bucket_mix_sums_to_one(bench):
    mix = bench.batch_bucket_mix(bench.REALISTIC_LEN_CDF, 8)
    assert abs(sum(mix.values()) - 1.0) < 1e-9
    # the documented histogram: ~43% of batch-8 batches bucket at 32
    assert 0.40 < mix[32] < 0.46
    assert mix[128] < 0.06
    # batch of 1 buckets at the per-tweet CDF exactly
    mix1 = bench.batch_bucket_mix(bench.REALISTIC_LEN_CDF, 1)
    assert abs(mix1[32] - 0.90) < 1e-9


def test_len_cdf_rejects_duplicate_widths(bench):
    """Round-5 review: a duplicate width would silently drop CDF mass in
    batch_bucket_mix's dict keying, then trip its telescoping-sum assert
    AFTER the expensive headline measurement already ran."""
    with pytest.raises(ValueError):
        bench.parse_len_cdf("32:0.5,32:0.9")


def test_compose_rate_skips_negligible_unmeasured_buckets(bench):
    """Round-5 review: the measurement loop skips buckets under MIX_SKIP_P,
    so compose_rate must skip them with the SAME threshold — at batch 128
    the 32-bucket has mass 0.9^128 ~ 1e-6 and is deliberately unmeasured;
    requiring a rate for it dropped the whole realistic row to None."""
    mix = bench.batch_bucket_mix(bench.REALISTIC_LEN_CDF, 128)
    assert 0 < mix[32] < bench.MIX_SKIP_P
    rates = {w: 500.0 for w, p in mix.items() if p >= bench.MIX_SKIP_P}
    v = bench.compose_rate(mix, rates)
    assert v is not None and abs(v - 500.0) < 1.0
    # but a SIGNIFICANT bucket without a rate still voids the row
    mix8 = bench.batch_bucket_mix(bench.REALISTIC_LEN_CDF, 8)
    rates8 = {w: 500.0 for w in mix8 if w != 32}
    assert bench.compose_rate(mix8, rates8) is None


def test_compose_rate_harmonic(bench):
    mix = {32: 0.5, 128: 0.5}
    rates = {32: 800.0, 128: 400.0}
    # time-weighted: 1 / (0.5/800 + 0.5/400) = 533.3
    assert abs(bench.compose_rate(mix, rates) - 1600 / 3) < 1e-6
    assert bench.compose_rate(mix, {32: 800.0}) is None  # missing width
    # degenerate mix entries are skipped, not divided by
    assert bench.compose_rate({32: 1.0, 64: 0.0}, {32: 500.0}) == 500.0


def test_realistic_beats_parity_in_model(bench):
    """Sanity on the published BASELINE.md width table: composing the
    measured per-width rates over the documented mix lands in the defended
    650-772 posts/s window, above the 128-pad row."""
    rates = {32: 772.0, 64: 591.0, 96: 566.0, 128: 480.0}
    mix = bench.batch_bucket_mix(bench.REALISTIC_LEN_CDF, 8)
    v = bench.compose_rate(mix, rates)
    assert 600 < v < 772
    assert v > rates[128]


def test_assemble_report_schema(bench):
    realistic = {"posts_per_sec": 650.0, "len_cdf": {"32": 0.9},
                 "batch_bucket_mix": {"32": 0.43},
                 "width_posts_per_sec": {"32": 772.0}}
    families = {"vilt": 300.0, "lxmert": 400.0, "mmbt": 200.0,
                "mm_late_eval": 900.0}
    out = bench.assemble_report(
        "posts/sec/chip (flagship)", 650.0, 1e12, 197e12, 8,
        parity=585.0, realistic=realistic, families=families,
        vs_baseline=3000.0, k_sweep_posts_per_sec={"100": 585.0})
    # the graded contract: ONE object with value/unit + both rows + families
    for key in ("metric", "value", "unit", "parity_shape_posts_per_sec",
                "realistic_workload", "families_posts_per_sec",
                "model_flops_per_step", "mfu", "vs_baseline",
                "k_sweep_posts_per_sec"):
        assert key in out, key
    assert out["value"] == 650.0
    assert out["parity_shape_posts_per_sec"] == 585.0
    assert out["families_posts_per_sec"]["mm_late_eval"] == 900.0
    import json
    json.dumps(out)  # JSON-serializable

    minimal = bench.assemble_report("m", 500.0, 0.0, 0.0, 8)
    assert minimal["mfu"] is None
    assert "realistic_workload" not in minimal


def test_family_models_inventory(bench):
    assert bench.FAMILY_MODELS == ("vilt", "lxmert", "mmbt")
