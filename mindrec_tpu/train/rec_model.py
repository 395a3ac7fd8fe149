"""RecModel — the high-level training API.

Re-designs the reference ``mindspore_rec.RecModel``
(``mindspore_rec/train/rec_model.py:34-309``): a model wrapper exposing
``train`` / ``eval`` / ``online_train``, with the reference's
online-training semantics preserved:

* ``online_train`` loops over an **unbounded** streaming dataset
  (``for epoch in range(sys.maxsize)`` — ``rec_model.py:217,283``);
* sink mode processes exactly one batch per sink iteration and
  ``sink_size`` must be 1 (``rec_model.py:267-271``), matching the
  reference's validation errors (ValueError for ``sink_size != 1`` or
  negative, TypeError for non-bool sink mode);
* full callback lifecycle around epochs/steps
  (``rec_model.py:215-249,277-309``);
* on CPU targets sink mode is forced off (``rec_model.py:179-186``) —
  here "sink" means async device prefetch, which we simply skip on CPU.

In this framework "dataset sink" = the :class:`PrefetchToDevice` async
host->device pipeline; the jitted step function plays the role of the
reference's compiled sink graph.
"""

from __future__ import annotations

import sys
from typing import Iterable

import jax
import numpy as np

from mindrec_tpu.data.criteo import PrefetchToDevice
from mindrec_tpu.train import optim as optim_lib
from mindrec_tpu.train.callbacks import CallbackManager, RunContext
from mindrec_tpu.train.metrics import AUCMetric
from mindrec_tpu.train.step import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
)


class RecModel:
    """High-level wrapper tying a model, dual optimizers, metrics and the
    train/eval step functions together.

    Args:
      model: a model object from ``mindrec_tpu.models`` (provides
        ``init`` / ``apply`` / ``apply_rows`` / ``loss`` / ``predict``).
      opt_w / opt_d: wide/deep optimizers; defaults match the reference
        dual-optimizer recipe (FTRL 5e-2 / Adam 3.5e-4, loss_scale from
        the model config).
      metrics: dict name -> Metric; default {"auc": AUCMetric()}.
    """

    def __init__(
        self,
        model,
        opt_w=None,
        opt_d=None,
        metrics=None,
        seed: int = 0,
        jit: bool = True,
        donate: bool = True,
        unique_bucket=None,
        prep_workers: int = 1,
        host_prep: bool | None = None,
        wire=None,
        prep_placement: str = "host",
        audit_every: int = 16,
    ):
        """``unique_bucket``: opt into the end-to-end host input
        pipeline (``data/pipeline.py``): an int (or
        :class:`~mindrec_tpu.data.pipeline.AdaptiveBucket`) bound on
        distinct ids per batch.  ``train(dataset_sink_mode=True)`` then
        treats the dataset as RAW host batches and runs prep-pool ->
        device-prefetch -> step, re-jitting automatically if a batch
        overflows the bucket.  ``prep_workers``: host prep threads.
        ``host_prep=True`` enables the pipeline without a bucket
        (lossless prep; required form for multi-id-group models, whose
        per-group metadata the prep emits automatically).

        ``wire``: optional :class:`~mindrec_tpu.data.wire.BatchWire` —
        compact-pack batches on the host and decode on device (cuts
        wire bytes on transfer-bound links; the step trace is
        unchanged).  ``prep_placement``: ``"host"`` (default) runs the
        sort prep on the host; ``"device"`` ships only (encoded) raw
        batches and derives sort metadata inside the step — requires
        ``unique_bucket`` (the step's static bound; audited on the host,
        grown + re-jitted on overflow).  Pick with
        :func:`~mindrec_tpu.data.wire.choose_prep` from the measured
        link bandwidth."""
        self.model = model
        sens = float(getattr(model.config, "loss_scale", 1.0))
        self.opt_w = opt_w or optim_lib.ftrl(loss_scale=sens)
        self.opt_d = opt_d or optim_lib.adam(loss_scale=sens)
        self.metrics = metrics if metrics is not None else {"auc": AUCMetric()}
        self.state: TrainState = init_train_state(
            model, jax.random.PRNGKey(seed), self.opt_w, self.opt_d
        )
        self._jit = jit
        self._donate = donate
        self.bucket_policy = None
        if unique_bucket is not None:
            from mindrec_tpu.data.pipeline import AdaptiveBucket

            self.bucket_policy = (
                unique_bucket
                if isinstance(unique_bucket, AdaptiveBucket)
                else AdaptiveBucket(int(unique_bucket))
            )
        self.prep_workers = prep_workers
        self.host_prep = (
            host_prep if host_prep is not None else unique_bucket is not None
        )
        if prep_placement not in ("host", "device"):
            raise ValueError(
                f"prep_placement must be 'host' or 'device', got "
                f"{prep_placement!r}"
            )
        if prep_placement == "device":
            if self.bucket_policy is None:
                raise ValueError(
                    "prep_placement='device' needs unique_bucket (the "
                    "step's static distinct-id bound)"
                )
            self.host_prep = True  # the pipeline still runs (audit+wire)
        self.wire = wire
        self.prep_placement = prep_placement
        self.audit_every = audit_every
        # with a bucket policy the step derives its static unique
        # bucket from the pipeline's trimmed uq_ids length, so a bucket
        # regrow is a shape change jit re-traces automatically; in
        # device-prep placement the bucket is an explicit static arg
        # instead and a regrow rebuilds the step (_on_bucket_grow)
        self._step_kw = dict(jit=jit, donate=donate)
        if prep_placement == "device":
            self._step_kw["unique_bucket"] = self.bucket_policy.bucket
        self.train_step = make_train_step(
            model, self.opt_w, self.opt_d, **self._step_kw
        )
        self.eval_step = make_eval_step(model, jit=jit)
        self.rank_id = jax.process_index()

    def _on_bucket_grow(self, new_bucket: int):
        """Device-prep placement: the host audit grew the bucket —
        rebuild the step at the new static bound (one re-jit)."""
        self._step_kw["unique_bucket"] = new_bucket
        self.train_step = make_train_step(
            self.model, self.opt_w, self.opt_d, **self._step_kw
        )

    @property
    def params(self):
        return self.state.params

    # ------------------------------------------------------------------
    # offline training
    # ------------------------------------------------------------------

    def train(
        self,
        epoch: int,
        train_dataset,
        callbacks=None,
        dataset_sink_mode: bool = True,
    ):
        """Epoch-bounded training over a re-iterable dataset."""
        self._check_sink_mode_type(dataset_sink_mode)
        cb = CallbackManager(callbacks)
        ctx = RunContext(rank_id=self.rank_id, train_state=self.state)
        cb.on_train_begin(ctx)
        step_num = 0
        for ep in range(1, epoch + 1):
            ctx.epoch_num = ep
            cb.on_train_epoch_begin(ctx)
            it = self._maybe_sink(train_dataset, dataset_sink_mode)
            for batch in it:
                step_num += 1
                ctx.cur_step_num = step_num
                cb.on_train_step_begin(ctx)
                self.state, losses = self.train_step(self.state, batch)
                ctx.net_outputs = losses
                ctx.train_state = self.state
                cb.on_train_step_end(ctx)
                if ctx.train_state is not self.state:
                    # a callback replaced the state (EvictionCallback
                    # resets freed rows) — train on it from here on
                    self.state = ctx.train_state
                if ctx.stop_requested:
                    break
            cb.on_train_epoch_end(ctx)
            if ctx.stop_requested:
                break
        cb.on_train_end(ctx)
        return self.state

    # ------------------------------------------------------------------
    # online (streaming, unbounded) training — reference parity
    # ------------------------------------------------------------------

    def online_train(
        self,
        train_dataset,
        callbacks=None,
        dataset_sink_mode: bool = False,
        sink_size: int = 1,
    ):
        """Unbounded streaming training (reference ``online_train``,
        ``rec_model.py:118-309``).  Iterates the streaming dataset until
        it is exhausted or a callback requests stop; the epoch loop is
        unbounded (``sys.maxsize``)."""
        self._check_sink_mode_type(dataset_sink_mode)
        if sink_size < 1:
            # parity: reference raises for sink_size <= 0 (rec_model.py:267-271)
            raise ValueError(
                f"The 'sink_size' must be a positive integer, but got {sink_size}."
            )
        if dataset_sink_mode and sink_size != 1:
            raise ValueError(
                "The 'sink_size' must be 1 for online training in dataset "
                f"sink mode, but got {sink_size}."
            )
        if jax.default_backend() == "cpu":
            # parity: CPU target forces non-sink (rec_model.py:179-186)
            dataset_sink_mode = False

        cb = CallbackManager(callbacks)
        ctx = RunContext(rank_id=self.rank_id, train_state=self.state)
        cb.on_train_begin(ctx)
        step_num = 0
        it = iter(self._maybe_sink(train_dataset, dataset_sink_mode))
        exhausted = False
        for ep in range(1, sys.maxsize):
            if exhausted or ctx.stop_requested:
                break
            ctx.epoch_num = ep
            cb.on_train_epoch_begin(ctx)
            # one "epoch" of a streaming dataset = one sink iteration
            # (sink_size==1: exactly one batch per iteration)
            try:
                batch = next(it)
            except StopIteration:
                exhausted = True
                cb.on_train_epoch_end(ctx)
                break
            step_num += 1
            ctx.cur_step_num = step_num
            cb.on_train_step_begin(ctx)
            self.state, losses = self.train_step(self.state, batch)
            ctx.net_outputs = losses
            ctx.train_state = self.state
            cb.on_train_step_end(ctx)
            if ctx.train_state is not self.state:
                # a callback replaced the state (EvictionCallback resets
                # freed rows mid-stream) — continue training on it
                self.state = ctx.train_state
            cb.on_train_epoch_end(ctx)
        cb.on_train_end(ctx)
        return self.state

    # ------------------------------------------------------------------
    # eval
    # ------------------------------------------------------------------

    def eval(self, dataset, metrics=None) -> dict:
        metrics = metrics or self.metrics
        for m in metrics.values():
            m.clear()
        for batch in dataset:
            probs, labels = self.eval_step(self.state.params, batch)
            probs, labels = np.asarray(probs), np.asarray(labels)
            for m in metrics.values():
                # metrics may declare extra batch columns (e.g. the
                # grouped MAP@12 needs display_id) via a `needs` attr
                extra = [np.asarray(batch[k]) for k in getattr(m, "needs", ())]
                m.update(probs, labels, *extra)
        return {name: m.eval() for name, m in metrics.items()}

    # ------------------------------------------------------------------

    @staticmethod
    def _check_sink_mode_type(dataset_sink_mode):
        if not isinstance(dataset_sink_mode, bool):
            # parity: reference raises TypeError for non-bool sink mode
            raise TypeError(
                "The 'dataset_sink_mode' must be a bool, but got "
                f"{type(dataset_sink_mode).__name__}."
            )

    def _maybe_sink(self, dataset, sink: bool) -> Iterable:
        if not sink:
            return iter(dataset)
        if self.host_prep:
            # end-to-end input pipeline: raw host batches -> prep pool
            # -> device prefetch, with adaptive re-bucketing (single
            # id group) or per-group lossless prep (multi-group models)
            from mindrec_tpu.data.pipeline import SparseInputPipeline
            from mindrec_tpu.train.step import prep_groups

            groups = prep_groups(self.model)  # tiny groups need no sort
            device_prep = self.prep_placement == "device"
            if device_prep and groups is not None:
                raise ValueError(
                    "prep_placement='device' is single-id-group only"
                )
            return iter(SparseInputPipeline(
                dataset,
                field_size=int(getattr(self.model.config, "field_size", 0)),
                policy=(
                    self.bucket_policy
                    if (device_prep or groups is None) else None
                ),
                groups=groups,
                workers=self.prep_workers,
                device=jax.default_backend() != "cpu",
                wire=self.wire,
                host_prep=not device_prep,
                audit_every=self.audit_every,
                on_grow=self._on_bucket_grow if device_prep else None,
            ))
        if jax.default_backend() != "cpu":
            return PrefetchToDevice(dataset, depth=2)
        return iter(dataset)
