"""Profiling / tracing hooks (reference aux-subsystem parity, SURVEY §5).

Maps the reference's observability surface to TPU-native tools:

* ``enable_profiling`` flag -> ``Profiler`` context around training
  (reference ``moxing_adapter.py:105-111``: Profiler() ...
  profiler.analyse()); here: ``jax.profiler`` trace written to a
  TensorBoard-compatible directory.
* ``save_graphs`` IR dumps (reference
  ``train_and_eval_parameter_server_distribute.py:157``) -> dumped
  HLO/StableHLO text for a jitted function.
"""

from __future__ import annotations

import contextlib
from pathlib import Path

import jax


class Profiler:
    """Start/stop profiler (reference MindSpore ``Profiler`` shape)."""

    def __init__(self, output_path: str = "./profiler_data"):
        self.output_path = output_path
        self._started = False
        Path(output_path).mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(output_path)
        self._started = True

    def analyse(self):
        """Stop and flush the trace (reference ``profiler.analyse()``)."""
        if self._started:
            jax.profiler.stop_trace()
            self._started = False


@contextlib.contextmanager
def profile(output_path: str = "./profiler_data"):
    p = Profiler(output_path)
    try:
        yield p
    finally:
        p.analyse()


def step_annotation(name: str, step: int):
    """Per-step trace annotation."""
    return jax.profiler.StepTraceAnnotation(name, step_num=step)


def dump_ir(fn, *example_args, path: str = "./graphs", name: str = "jit_fn",
            **example_kwargs) -> dict:
    """Dump lowered StableHLO and optimized HLO for a function
    (reference ``save_graphs=True`` parity). Returns the file paths."""
    out = Path(path)
    out.mkdir(parents=True, exist_ok=True)
    lowered = jax.jit(fn).lower(*example_args, **example_kwargs)
    stablehlo = out / f"{name}.stablehlo.txt"
    stablehlo.write_text(lowered.as_text())
    files = {"stablehlo": str(stablehlo)}
    try:
        compiled = lowered.compile()
        hlo = out / f"{name}.optimized_hlo.txt"
        hlo.write_text(compiled.as_text())
        files["optimized_hlo"] = str(hlo)
    except Exception:  # compile may be unavailable on some backends
        pass
    return files


# ---------------------------------------------------------------------------
# speed-of-light floor (PROFILE_r02/r03 arithmetic, automated)
# ---------------------------------------------------------------------------

# Measured stream/matmul envelopes of the dev chip (benchmarks/
# PROFILE_r02.md "Speed-of-light analysis": streamed kernels sustain
# ~136-137 GB/s on a ~215 GB/s part; [16000,1024]x[1024,1024] bf16
# matmuls run at ~190-200 TFLOP/s).  Override per deployment part.
HBM_GBPS = 215.0
MXU_TFLOPS = 200.0
SECTOR_BYTES = 512  # random-row reads are sector-granular


def _dsize(dtype_name: str) -> int:
    return 2 if "16" in str(dtype_name) else 4


def sparse_step_floor(model, batch_size: int, *, unique_bucket=None,
                      hbm_gbps: float = HBM_GBPS,
                      mxu_tflops: float = MXU_TFLOPS) -> dict:
    """Analytic LOWER BOUND on the sparse train step's time from static
    byte/FLOP counts — the manual PROFILE_r02/r03 arithmetic as a
    library call (reference ships TimeMonitor everywhere,
    ``train_and_eval_distribute.py:110``; this framework's
    differentiator is that it also knows its floors).

    Model: bandwidth-bound table phases + MXU-bound MLP, summed:

    * gather streams every sparse table once (read) and writes the
      ``[U, width]`` unique row buffer;
    * the two order crossings move ``N`` random rows at sector
      granularity (512 B reads) each way;
    * the optimizer update pumps table + 2 state arrays read+write;
      per table the traffic is bounded BELOW by
      ``min(whole array, touched columns at sector granularity)`` —
      the real kernels stream whole tiles (more bytes), so the bound
      holds whatever the tile schedule does;
    * the MLP contributes ``6 * B * sum(in*out)`` FLOPs (fwd 2 + bwd 4)
      at the measured bf16 matmul rate.

    Omitted terms (elementwise epilogues, segsum, host work) only make
    the real step SLOWER, so the returned floor stays a true bound.
    Returns a dict with the byte/FLOP breakdown, ``floor_ms`` and
    ``floor_samples_per_sec``.
    """
    specs = getattr(model, "table_specs", {})
    cfg = model.config
    n_positions = batch_size * int(getattr(cfg, "field_size", 0) or 0)
    u = int(unique_bucket) if unique_bucket else n_positions

    table_bytes = 0
    width = 0
    for _name, (_path, spec) in specs.items():
        rows, cols = spec.storage_shape
        dt = _dsize(getattr(spec, "dtype", "float32"))
        tb = rows * cols * dt
        if getattr(spec, "row_packed", False):
            # packed layout: one 512-byte storage row per touched unique
            touched = min(tb, u * max(SECTOR_BYTES, cols * dt))
            width += spec.emb_dim
        else:
            # feature-major: per touched column, one sector per sublane
            # group of the column's bytes
            touched = min(tb, u * max(SECTOR_BYTES, rows * dt))
            width += rows
        gather = touched
        # adam/ftrl: 3 arrays read + 3 written (state at table width)
        update = 6 * touched
        table_bytes += gather + update
    lane_width = max(128, -(-width // 128) * 128)
    buf_bytes = u * lane_width * 4  # the [U, width] f32 buffer write

    # order crossings: batch->sorted and sorted->batch; each moves N
    # random rows — sector-granular (512 B) reads + bf16 transport-row
    # writes (the measured physics of PROFILE_r02's backward permute)
    row_write = lane_width * 2  # bf16 matmul_dtype transport
    crossing_bytes = (
        2 * n_positions * (SECTOR_BYTES + row_write) if n_positions else 0
    )

    mlp_flops = 0
    dims = getattr(model, "mlp_dims", None)
    if dims:
        mlp_flops = 6 * batch_size * sum(i * o for i, o in dims)

    hbm_bytes = table_bytes + buf_bytes + crossing_bytes
    hbm_ms = hbm_bytes / (hbm_gbps * 1e6)
    mxu_ms = mlp_flops / (mxu_tflops * 1e9)
    floor_ms = hbm_ms + mxu_ms
    return {
        "table_bytes": int(table_bytes),
        "crossing_bytes": int(crossing_bytes),
        "buffer_bytes": int(buf_bytes),
        "hbm_bytes": int(hbm_bytes),
        "mlp_flops": int(mlp_flops),
        "hbm_ms": round(hbm_ms, 3),
        "mxu_ms": round(mxu_ms, 3),
        "floor_ms": round(floor_ms, 3),
        "floor_samples_per_sec": (
            round(batch_size / (floor_ms / 1e3)) if floor_ms else None
        ),
        "hbm_gbps": hbm_gbps,
        "mxu_tflops": mxu_tflops,
    }
