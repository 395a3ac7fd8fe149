"""Training callbacks (reference lifecycle parity).

Mirrors the reference callback surface: per-step loss logging with rank
id to ``loss.log`` (``models/wide_deep/src/callbacks.py:51-76``),
per-epoch eval + ``eval.log`` (``callbacks.py:105-131``), step timing
(``TimeMonitor``), and interval/keep-max checkpointing
(``examples/online_learning/online_train.py:81-82``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np


@dataclass
class RunContext:
    """State handed to callbacks each step/epoch."""

    epoch_num: int = 0
    cur_step_num: int = 0
    batch_num: int = 0
    net_outputs: Any = None
    train_state: Any = None
    rank_id: int = 0
    _stop: bool = field(default=False, repr=False)

    def request_stop(self):
        self._stop = True

    @property
    def stop_requested(self) -> bool:
        return self._stop


class Callback:
    def on_train_begin(self, ctx: RunContext):
        pass

    def on_train_end(self, ctx: RunContext):
        pass

    def on_train_epoch_begin(self, ctx: RunContext):
        pass

    def on_train_epoch_end(self, ctx: RunContext):
        pass

    def on_train_step_begin(self, ctx: RunContext):
        pass

    def on_train_step_end(self, ctx: RunContext):
        pass


class CallbackManager(Callback):
    def __init__(self, callbacks):
        self.callbacks = list(callbacks or [])

    def _fan(self, name, ctx):
        for cb in self.callbacks:
            getattr(cb, name)(ctx)

    def on_train_begin(self, ctx):
        self._fan("on_train_begin", ctx)

    def on_train_end(self, ctx):
        self._fan("on_train_end", ctx)

    def on_train_epoch_begin(self, ctx):
        self._fan("on_train_epoch_begin", ctx)

    def on_train_epoch_end(self, ctx):
        self._fan("on_train_epoch_end", ctx)

    def on_train_step_begin(self, ctx):
        self._fan("on_train_step_begin", ctx)

    def on_train_step_end(self, ctx):
        self._fan("on_train_step_end", ctx)


class LossCallback(Callback):
    """Print / append per-step wide+deep loss with rank id
    (reference ``LossCallBack``, ``callbacks.py:51-76``).  Also watches
    for NaN/Inf loss (the reference's docstringed oracle)."""

    def __init__(self, loss_file: Optional[str] = None, per_print_times: int = 1):
        self.loss_file = loss_file
        self.per_print_times = per_print_times

    def on_train_step_end(self, ctx: RunContext):
        if ctx.cur_step_num % self.per_print_times != 0:
            return
        out = ctx.net_outputs
        if isinstance(out, tuple) and len(out) == 2:
            loss_w, loss_d = float(np.asarray(out[0])), float(np.asarray(out[1]))
            msg = (
                f"epoch: {ctx.epoch_num} step: {ctx.cur_step_num}, "
                f"wide_loss is {loss_w:.6f}, deep_loss is {loss_d:.6f}"
            )
            bad = not (np.isfinite(loss_w) and np.isfinite(loss_d))
        else:
            loss = float(np.asarray(out))
            msg = f"epoch: {ctx.epoch_num} step: {ctx.cur_step_num}, loss is {loss:.6f}"
            bad = not np.isfinite(loss)
        if bad:
            raise ValueError(f"loss is NaN or Inf at step {ctx.cur_step_num}: {msg}")
        print(f"[rank {ctx.rank_id}] {msg}", flush=True)
        if self.loss_file:
            with open(self.loss_file, "a") as f:
                f.write(msg + "\n")


class EvalCallback(Callback):
    """Run eval at each epoch end, append AUC to eval log
    (reference ``EvalCallBack``, ``callbacks.py:105-131``)."""

    def __init__(self, rec_model, dataset, eval_file: Optional[str] = None):
        self.rec_model = rec_model
        self.dataset = dataset
        self.eval_file = eval_file
        self.history: list[float] = []

    def on_train_epoch_end(self, ctx: RunContext):
        metrics = self.rec_model.eval(self.dataset)
        auc = metrics.get("auc")
        self.history.append(auc)
        msg = f"epoch: {ctx.epoch_num}, auc: {auc}"
        print(msg, flush=True)
        if self.eval_file:
            with open(self.eval_file, "a") as f:
                f.write(time.strftime("%Y-%m-%d %H:%M:%S ") + msg + "\n")


class TimeMonitor(Callback):
    """Epoch + per-step timing (reference ``TimeMonitor``,
    ``train_and_eval_distribute.py:110``).

    ``speed_of_light``: pass ``(model, batch_size)`` — or a precomputed
    :func:`mindrec_tpu.utils.profiling.sparse_step_floor` dict — and
    each epoch line additionally reports achieved samples/s as a
    percentage of the model's analytic HBM/MXU floor, so production
    runs see how far from the hardware ceiling they sit without a
    manual profile pass."""

    def __init__(self, data_size: Optional[int] = None,
                 speed_of_light=None, batch_size: Optional[int] = None):
        self.data_size = data_size
        self.step_times: list[float] = []
        self._epoch_t0 = None
        self._step_t0 = None
        self.batch_size = batch_size
        self.floor = None
        if speed_of_light is not None:
            if isinstance(speed_of_light, dict):
                self.floor = speed_of_light
            else:  # a model: derive the floor from its static shapes
                from mindrec_tpu.utils.profiling import sparse_step_floor

                bs = batch_size or speed_of_light.config.batch_size
                self.batch_size = bs
                self.floor = sparse_step_floor(speed_of_light, bs)

    def on_train_epoch_begin(self, ctx):
        self._epoch_t0 = time.perf_counter()
        self.step_times = []

    def on_train_step_begin(self, ctx):
        self._step_t0 = time.perf_counter()

    def on_train_step_end(self, ctx):
        if self._step_t0 is not None:
            self.step_times.append(time.perf_counter() - self._step_t0)

    def on_train_epoch_end(self, ctx):
        dt = time.perf_counter() - self._epoch_t0
        n = len(self.step_times) or 1
        line = (
            f"epoch time: {dt * 1000:.3f} ms, per step time: "
            f"{dt * 1000 / n:.3f} ms"
        )
        if self.floor and self.batch_size and self.step_times:
            med = sorted(self.step_times)[len(self.step_times) // 2]
            sps = self.batch_size / med
            pct = 100.0 * (self.floor["floor_ms"] / 1e3) / med
            line += (
                f", {sps:,.0f} samples/s = {pct:.0f}% of the "
                f"{self.floor['floor_samples_per_sec']:,}/s analytic "
                f"floor (hbm {self.floor['hbm_ms']} ms + mxu "
                f"{self.floor['mxu_ms']} ms)"
            )
        print(line, flush=True)


class CheckpointCallback(Callback):
    """Save every ``save_steps`` steps, keep at most ``keep_max``
    (reference online-learning policy: every 100 steps keep 5,
    ``online_train.py:81-82``)."""

    def __init__(self, directory: str, prefix: str = "ckpt",
                 save_steps: int = 100, keep_max: int = 5,
                 async_save: bool = False):
        """``async_save=True`` snapshots to host synchronously but
        serializes/writes on a background thread (AsyncCheckpointer):
        the trainer never blocks on disk between saves."""
        self.directory = directory
        self.prefix = prefix
        self.save_steps = save_steps
        self.keep_max = keep_max
        self.saved: list[str] = []
        self._async = None
        if async_save:
            from mindrec_tpu.io.checkpoint import AsyncCheckpointer

            self._async = AsyncCheckpointer()

    def on_train_step_end(self, ctx: RunContext):
        if ctx.cur_step_num % self.save_steps != 0:
            return
        from mindrec_tpu.io.checkpoint import save_checkpoint

        # file numbering uses the GLOBAL optimizer step (survives
        # restarts), not the run-local counter — so a resumed run's
        # saves sort after the pre-crash ones and retention stays correct
        try:
            gstep = int(ctx.train_state.step)
        except (AttributeError, TypeError):
            gstep = ctx.cur_step_num
        kw = dict(step=gstep, prefix=self.prefix, keep_max=self.keep_max)
        if self._async is not None:
            if getattr(self._async._pool, "_shutdown", False):
                # a previous train run closed the executor; the
                # callback stays reusable across train()/online_train()
                from mindrec_tpu.io.checkpoint import AsyncCheckpointer

                self._async = AsyncCheckpointer()
            fut = self._async.save(self.directory, ctx.train_state, **kw)
            # .saved holds str paths only: append from a done-callback so
            # mid-run (or post-crash) readers never see Future objects
            fut.add_done_callback(
                lambda f: self.saved.append(f.result())
                if f.exception() is None
                else None
            )
            return
        path = save_checkpoint(self.directory, ctx.train_state, **kw)
        self.saved.append(path)

    def on_train_end(self, ctx: RunContext):
        if self._async is not None:
            self._async.close()


class FaultInjector(Callback):
    """Crash the trainer at a given step — the fault-injection half of
    the elastic-recovery story (SURVEY §5: the reference has no story;
    here a crashed trainer restarted under examples/run_elastic_train.sh
    with --resume continues from its last checkpoint, and
    tests/test_elastic.py proves the round trip)."""

    def __init__(self, crash_at_step: int, once_marker: str | None = None):
        self.crash_at_step = crash_at_step
        self.once_marker = once_marker  # crash only on the first run

    def on_train_step_end(self, ctx: RunContext):
        if ctx.cur_step_num != self.crash_at_step:
            return
        if self.once_marker:
            from pathlib import Path as _P

            marker = _P(self.once_marker)
            if marker.exists():
                return  # already crashed once; let the restart finish
            marker.touch()
        raise RuntimeError(
            f"FaultInjector: simulated crash at step {ctx.cur_step_num}"
        )


class ExportCallback(Callback):
    """Periodically export the SERVING artifact during (online)
    training — the reference's minute-level model-update loop ends in
    an inference service reloading the freshest model
    (``docs/online_learning/online_learning.md``; ckpt every 100 steps,
    ``examples/online_learning/online_train.py:81-82``).  Checkpoints
    carry optimizer state for RESUME; this exports the inference-only
    artifact (MREC1 + .npz sidecar, and optionally ONNX) the serving
    side loads.

    Writes ``<dir>/<prefix>-<global_step>.mrec`` (+ ``.onnx``) every
    ``export_steps`` steps, keeps the newest ``keep_max``, and
    maintains a ``<prefix>-latest`` symlink for pollers."""

    def __init__(self, directory: str, model_kind: str,
                 export_steps: int = 100, prefix: str = "model",
                 keep_max: int = 5, onnx_model=None):
        """``onnx_model``: pass the model object to ALSO emit ONNX
        (needs the model for its table specs/config)."""
        from pathlib import Path as _P

        self.directory = _P(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.model_kind = model_kind
        self.export_steps = export_steps
        self.prefix = prefix
        self.keep_max = keep_max
        self.onnx_model = onnx_model
        self.exported: list[str] = []

    def on_train_step_end(self, ctx: RunContext):
        if ctx.cur_step_num % self.export_steps != 0:
            return
        import os

        from mindrec_tpu.io.export import export_model

        try:
            gstep = int(ctx.train_state.step)
        except (AttributeError, TypeError):
            gstep = ctx.cur_step_num
        params = ctx.train_state.params
        path = self.directory / f"{self.prefix}-{gstep:010d}.mrec"
        export_model(path, self.model_kind, params)
        if self.onnx_model is not None:
            from mindrec_tpu.io.onnx import export_onnx

            export_onnx(path.with_suffix(".onnx"), self.model_kind,
                        self.onnx_model, params)
        self.exported.append(str(path))
        # atomic latest pointer for serving-side pollers
        link = self.directory / f"{self.prefix}-latest"
        tmp = self.directory / f".{self.prefix}-latest.tmp"
        try:
            if tmp.exists() or tmp.is_symlink():
                tmp.unlink()
            tmp.symlink_to(path.name)
            os.replace(tmp, link)
        except OSError:
            pass  # filesystems without symlinks: pollers sort by name
        from pathlib import Path as _P

        while len(self.exported) > self.keep_max:
            old = self.exported.pop(0)  # ".../<prefix>-<step>.mrec"
            for victim in (old, old + ".npz",
                           str(_P(old).with_suffix(".onnx"))):
                try:
                    os.unlink(victim)
                except OSError:
                    pass


class EvictionCallback(Callback):
    """Periodic feature eviction (+ optional incremental hash-table
    export) for dynamic-embedding online training.

    Reference semantics: ``evict_filter_value`` erases keys untouched
    for that many steps (``mindspore_rec/ops/embedding.py:136-144``;
    eviction-during-training robustness is a known reference risk area —
    the cache-eviction core-dump fix in ``RELEASE.md:6``).  Every
    ``every_steps`` this callback:

    1. calls ``adapter.evict`` — expired keys leave the hash store,
       their arena rows re-initialize and their optimizer state zeroes;
       the new TrainState is written back through ``ctx.train_state``
       (RecModel continues training on it);
    2. optionally dumps the incremental table — admitted keys + their
       rows (``adapter.export_tables``) — to ``export_path`` atomically,
       the artifact a serving process hot-reloads via
       ``adapter.import_tables`` (reference incremental model
       import/export, ``RELEASE.md:18``).
    """

    def __init__(self, adapter, tables, every_steps: int = 100,
                 export_path=None, async_export: bool = True):
        if int(every_steps) < 1:
            raise ValueError(
                f"every_steps must be >= 1, got {every_steps}"
            )
        self.adapter = adapter
        self.tables = tables
        self.every = int(every_steps)
        self.export_path = export_path
        self.evicted_total = 0
        self.exports = 0
        # the incremental export can be large; write it off the training
        # thread (same single-writer pattern as AsyncCheckpointer —
        # exports are serialized through a 1-thread pool, so a slow disk
        # back-pressures the NEXT export, not every step)
        self._pool = None
        self._pending = None
        if export_path is not None and async_export:
            import concurrent.futures

            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mrec-evict-export"
            )

    def _write(self, blob):
        import os

        tmp = str(self.export_path) + ".tmp.npz"
        np.savez(tmp, **blob)
        os.replace(tmp, self.export_path)

    def on_train_step_end(self, ctx: RunContext):
        if ctx.cur_step_num % self.every != 0:
            return
        state, n = self.adapter.evict(ctx.train_state, self.tables)
        self.evicted_total += int(n)
        ctx.train_state = state
        if self.export_path is not None:
            blob = self.adapter.export_tables(state.params, self.tables)
            if self._pool is not None:
                if self._pending is not None:
                    self._pending.result()  # surface write errors in order
                self._pending = self._pool.submit(self._write, blob)
            else:
                self._write(blob)
            self.exports += 1

    def on_train_end(self, ctx: RunContext):
        if self._pending is not None:
            self._pending.result()
            self._pending = None
