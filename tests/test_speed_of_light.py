"""The productized speed-of-light analysis (VERDICT r3 item 8):
``sparse_step_floor`` automates the PROFILE_r02/r03 byte/FLOP
arithmetic, and ``TimeMonitor(speed_of_light=...)`` surfaces achieved
samples/s as a fraction of it."""

import numpy as np

from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.train.callbacks import RunContext, TimeMonitor
from mindrec_tpu.utils.profiling import sparse_step_floor


def _bench_model():
    return WideDeepModel(WideDeepConfig(
        batch_size=16000, field_size=39, vocab_size=5_860_000, emb_dim=16,
        deep_layer_dim=(1024,) * 7, sparse=True, loss_scale=1024.0,
    ))


def test_floor_for_bench_recipe_is_sane():
    f = sparse_step_floor(_bench_model(), 16000, unique_bucket=40960)
    for k in ("table_bytes", "crossing_bytes", "buffer_bytes", "mlp_flops"):
        assert f[k] > 0, (k, f)
    # the bench recipe's dominant cost: two 624k-row sector-granular
    # crossings (~1 GB) + the 7x1024 MLP (~0.66 TFLOP)
    assert f["crossing_bytes"] > f["table_bytes"]
    assert 0.3e12 < f["mlp_flops"] < 2e12
    # a true lower bound: the floor must predict MORE throughput than
    # the chip has ever achieved on this recipe (measured 706-714k)
    assert f["floor_samples_per_sec"] > 750_000, f
    # and it must stay a bound a real chip could plausibly approach
    assert f["floor_samples_per_sec"] < 20_000_000, f
    assert abs(f["floor_ms"] - (f["hbm_ms"] + f["mxu_ms"])) < 0.01


def test_floor_scales_with_batch():
    m = _bench_model()
    f1 = sparse_step_floor(m, 16000, unique_bucket=40960)
    f2 = sparse_step_floor(m, 32000, unique_bucket=40960)
    assert f2["mlp_flops"] == 2 * f1["mlp_flops"]
    assert f2["crossing_bytes"] == 2 * f1["crossing_bytes"]


def test_time_monitor_reports_floor(capsys):
    m = _bench_model()
    tm = TimeMonitor(speed_of_light=m, batch_size=16000)
    assert tm.floor is not None and tm.floor["floor_samples_per_sec"] > 0
    ctx = RunContext()
    tm.on_train_epoch_begin(ctx)
    for _ in range(3):
        tm.on_train_step_begin(ctx)
        tm._step_t0 -= 0.025  # pretend the step took ~25 ms
        tm.on_train_step_end(ctx)
    tm.on_train_epoch_end(ctx)
    out = capsys.readouterr().out
    assert "% of the" in out and "analytic" in out
    # 25 ms on a ~9-10 ms floor -> a double-digit percentage
    pct = float(out.split("% of the")[0].split("=")[-1].strip())
    assert 10 <= pct <= 99, out


def test_time_monitor_without_floor_unchanged(capsys):
    tm = TimeMonitor()
    ctx = RunContext()
    tm.on_train_epoch_begin(ctx)
    tm.on_train_step_begin(ctx)
    tm.on_train_step_end(ctx)
    tm.on_train_epoch_end(ctx)
    out = capsys.readouterr().out
    assert "epoch time" in out and "%" not in out
