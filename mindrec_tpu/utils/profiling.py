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
