"""Async end-to-end input pipeline: raw host batches -> multi-worker
host prep -> async device staging -> jitted step.

This is the TPU-native re-design of the reference's dataset-sink
engine: MindData's native pipeline threads prepare batches and feed a
device queue the compiled graph pops (``mindspore_rec/train/
rec_model.py:124-131``; SURVEY §3.1 boundary #2).  Here the pieces are
explicit and composable:

* :class:`HostPrepPool` — N worker threads run the native batch prep
  (``native/libmindrec_batchprep.so`` releases the GIL, so plain
  threads give true overlap with zero pickling) while preserving batch
  order; bounded in-flight depth applies back-pressure.
* :class:`AdaptiveBucket` — the production ``unique_bucket`` policy:
  tracks the running distinct-id count, warns at 90% occupancy, and on
  overflow grows the bucket (rounded to the kernel tile quantum) so
  the trainer re-jits once instead of crashing (the bare
  ``RuntimeError`` a static bucket would raise).
* :class:`SparseInputPipeline` — composes raw-batch source -> prep pool
  -> :class:`PrefetchToDevice`; on :class:`BucketOverflow` it re-preps
  the offending batch at the grown bucket and invokes ``on_grow`` so
  the trainer swaps in a re-jitted step (growing is always safe: the
  bucket only pads, so already-staged batches remain valid).

Steady-state throughput = max(step, prep/workers, host->device copy).
On production hosts the PCIe copy (~GB/s) is negligible and one prep
worker sustains the 16000-sample W&D step (prep ~10 ms < step ~22 ms);
through this dev rig's ~60 MB/s tunnel the copy dominates instead —
see benchmarks/PROFILE_r03.md for the measured breakdown.
"""

from __future__ import annotations

import collections
import concurrent.futures
import threading

import numpy as np

from mindrec_tpu.data.criteo import PrefetchToDevice
from mindrec_tpu.train.step import BucketOverflow, make_batch_sort


def round_bucket(n: int, quantum: int = 2048) -> int:
    """Round a distinct-id bound up to the streamed kernels' tile
    quantum (``train/step.py`` rounds ``unique_bucket`` the same way)."""
    return max(quantum, (int(n) + quantum - 1) // quantum * quantum)


class AdaptiveBucket:
    """Production ``unique_bucket`` policy (VERDICT r2 item 9).

    ``observe(nu)`` tracks the running max distinct-id count and warns
    once past ``warn_frac`` occupancy; ``grow(nu)`` returns the new
    bucket after an overflow (``nu * headroom``, tile-rounded).
    """

    def __init__(self, bucket: int, headroom: float = 1.2,
                 warn_frac: float = 0.9, quantum: int = 2048,
                 log=print):
        self.bucket = round_bucket(bucket, quantum)
        self.headroom = headroom
        self.warn_frac = warn_frac
        self.quantum = quantum
        self.max_seen = 0
        self._warned = False
        self._log = log

    @classmethod
    def from_sample(cls, batches, **kw) -> "AdaptiveBucket":
        """Derive the initial bucket from sample batches (the bench's
        x-headroom derivation, now a first-class constructor)."""
        headroom = kw.get("headroom", 1.2)
        mx = max(
            int(np.unique(np.asarray(b["ids"])).size) for b in batches
        )
        return cls(int(mx * headroom), **kw)

    def observe(self, nu: int):
        if nu > self.max_seen:
            self.max_seen = nu
        if not self._warned and nu > self.warn_frac * self.bucket:
            self._warned = True
            self._log(
                f"[mindrec] unique_bucket at {nu}/{self.bucket} "
                f"(> {self.warn_frac:.0%}); an overflow will re-jit at "
                f"~{round_bucket(int(self.bucket * self.headroom), self.quantum)}",
                flush=True,
            )

    def grow(self, nu: int) -> int:
        new = round_bucket(int(max(nu, self.bucket) * self.headroom),
                           self.quantum)
        self._log(
            f"[mindrec] unique_bucket overflow: {nu} distinct ids > "
            f"{self.bucket}; growing to {new} (one-time re-jit)",
            flush=True,
        )
        self.bucket = new
        self._warned = False
        return new


class HostPrepPool:
    """Ordered multi-worker prep over an iterator of host batches.

    ``prep`` runs inside ``workers`` threads — the native batch-prep
    call releases the GIL, so prep genuinely overlaps the (also mostly
    GIL-free) device step dispatch.  At most ``depth`` batches are in
    flight; results are yielded strictly in source order.

    ``prep`` may raise; the exception surfaces on the consumer side in
    order, carrying ``.raw_batch`` so a supervisor can retry.
    """

    def __init__(self, source, prep, workers: int = 1, depth: int = 3):
        self.source = source
        self.prep = prep
        self.workers = max(1, int(workers))
        self.depth = max(self.workers, int(depth))

    def __iter__(self):
        ex = concurrent.futures.ThreadPoolExecutor(
            max_workers=self.workers, thread_name_prefix="mrec-prep"
        )
        futs: collections.deque = collections.deque()
        it = iter(self.source)

        def submit_next() -> bool:
            try:
                raw = next(it)
            except StopIteration:
                return False
            fut = ex.submit(self.prep, raw)
            fut.raw_batch = raw
            futs.append(fut)
            return True

        try:
            for _ in range(self.depth):
                if not submit_next():
                    break
            while futs:
                fut = futs.popleft()
                try:
                    out = fut.result()
                except BaseException as e:
                    e.raw_batch = fut.raw_batch
                    raise
                submit_next()
                yield out
        finally:
            ex.shutdown(wait=False, cancel_futures=True)


def _stack_groups(it, k: int, pad_tail: bool = False):
    """Group k consecutive batches into one stacked dict (axis-0 stack
    per key) so the device staging pays ONE transfer round-trip per
    group; the tail group may be shorter.

    ``pad_tail``: pad a short tail group to k by repeating its last
    batch and attach the REAL batch count under ``"__sb_n__"`` (0-d
    int32).  Fused consumers (one jitted slice+decode+step over the
    [k, ...] supergroup) would otherwise re-trace on the tail's changed
    operand shape — ~5 min of mid-stream remote compile on this rig
    (PROFILE_r04.md §4 caveat); consumers must run only the first
    ``__sb_n__`` slices."""
    def stack(group):
        if pad_tail:
            # __sb_n__ rides EVERY group (not just padded ones) so the
            # staged pytree structure — and therefore the fused
            # consumer's compiled trace — is identical for full and
            # tail groups
            real = len(group)
            group = group + [group[-1]] * (k - real)
            out = stack_keys(group)
            out["__sb_n__"] = np.int32(real)
            return out
        return stack_keys(group)

    def stack_keys(group):
        try:
            return {
                key: np.stack([g[key] for g in group]) for key in group[0]
            }
        except ValueError as e:
            # a mid-group AdaptiveBucket regrow changes the uq arrays'
            # length; surface the cause instead of np.stack's opaque
            # shape error (flushing the short pre-grow group would drop
            # the size guarantee consumers rely on)
            raise ValueError(
                "superbatch group has ragged per-key shapes — most "
                "likely the unique bucket grew mid-group (AdaptiveBucket "
                "on_grow); use a bucket with enough headroom to cover "
                f"the stream, or superbatch=1: {e}"
            ) from e

    group = []
    for b in it:
        group.append(b)
        if len(group) == k:
            yield stack(group)
            group = []
    if group:
        yield stack(group)


def _unstack_groups(it):
    """Inverse of :func:`_stack_groups` after staging: slicing a
    device-resident array is a device op — no further transfers."""
    for sb in it:
        if "__sb_n__" in sb:
            sb = dict(sb)
            n = int(sb.pop("__sb_n__"))
        else:
            n = next(iter(sb.values())).shape[0]
        for i in range(n):
            yield {key: v[i] for key, v in sb.items()}


class SparseInputPipeline:
    """raw host batches -> prep pool -> (optional) device prefetch.

    The end-to-end dataset-sink for sparse training: yields batches
    ready for a ``make_train_step(..., unique_bucket=policy.bucket)``
    step.  On bucket overflow it grows the policy, re-preps the
    offending batch, and calls ``on_grow(new_bucket)`` (the trainer
    swaps in a re-jitted step; in-flight batches stay valid because a
    larger bucket only pads further).

    Args:
      source: iterable of raw host batches (dicts with ``ids`` etc.).
      field_size: ids per sample (prep contract).
      policy: :class:`AdaptiveBucket` (or None: lossless prep, no
        bucket checks — the step must then use its default bucket).
      workers/depth: prep pool size.
      device: stage onto the default device via
        :class:`PrefetchToDevice` (set False for host-side consumers
        and CPU tests).
      sharding: optional sharding (dict or single) for device staging.
      minimal: drop ``sorted_ids``/``inv`` from prep output (the jitted
        step never reads them; saves prep time and transfer bytes).
      on_grow: callable(new_bucket) invoked after a re-bucket.
      wire: optional :class:`~mindrec_tpu.data.wire.BatchWire` — pack
        batches on the host and decode them on device (one small jitted
        elementwise pass), shrinking bytes-on-the-wire for
        transfer-bound links; decoded batches match the un-packed
        layout exactly, so the trainer's step trace is unchanged.
      host_prep: ``False`` = device-prep mode: skip the host sort
        entirely and ship only (encoded) raw batches — the step derives
        sort/unique metadata on device (build it with
        ``unique_bucket=policy.bucket``).  Pays ~30% more chip time but
        halves-to-quarters the wire payload; see
        :func:`~mindrec_tpu.data.wire.choose_prep` for the placement
        policy.  The bucket contract is audited on the host every
        ``audit_every`` batches (a full ``np.unique``; the device path
        would silently drop overflow ids otherwise), growing the policy
        and invoking ``on_grow`` like the host-prep path.
      decode: with ``wire``, ``False`` yields the staged PACKED batches
        (no device decode pass) — for consumers that fuse the decode
        into their own jitted step (benchmarks/wire_fused_probe.py).
      unstack: with ``superbatch``>1 and ``decode=False``, ``False``
        yields the staged [k, ...] supergroups directly — for consumers
        that fuse the per-batch slice + decode into their own jitted
        step (ONE dispatch per batch; see bench.py's wire extra).
      superbatch: stage k batches per host->device transfer (stacked
        on the host, sliced apart device-side — slicing a staged array
        is a device op, not a transfer).  High-round-trip links pay a
        large FIXED latency per transfer (measured ~80 ms on the dev
        tunnel regardless of size, benchmarks/PROFILE_r04.md), so one
        k-batch put amortizes it toward the pure-bandwidth floor — the
        same economics as the reference's 1000-samples-per-record
        packing (``process_data.py:259-264``).  Consumers see ordinary
        per-batch dicts; the tail group may be smaller.
    """

    def __init__(self, source, field_size: int, policy=None,
                 workers: int = 1, depth: int = 3, device: bool = True,
                 sharding=None, minimal: bool = True, on_grow=None,
                 prefetch_depth: int = 2, groups: dict | None = None,
                 wire=None, host_prep: bool = True, audit_every: int = 16,
                 decode: bool = True, superbatch: int = 1,
                 unstack: bool = True, pad_tail: bool = False):
        self.source = source
        self.field_size = field_size
        self.policy = policy
        self.workers = workers
        self.depth = depth
        self.device = device
        self.sharding = sharding
        self.minimal = minimal
        self.on_grow = on_grow
        self.prefetch_depth = prefetch_depth
        self.wire = wire
        self.host_prep = host_prep
        self.audit_every = audit_every
        self.superbatch = int(superbatch)
        self.unstack = unstack
        self.pad_tail = bool(pad_tail)
        if not unstack and (superbatch <= 1 or decode):
            raise ValueError(
                "unstack=False yields staged supergroups for fused "
                "consumers; it requires superbatch>1 and decode=False"
            )
        if not host_prep and groups is not None:
            raise ValueError("device-prep mode is single-id-group only")
        if self.superbatch > 1 and sharding is not None:
            # staged supergroups are [k, B, ...]: a per-batch sharding
            # (e.g. P('data') on the batch axis) would land on the
            # group axis instead — reject until the staged layout
            # carries shardings (mirrors the wire+sharding guard)
            raise ValueError(
                "superbatch>1 stages stacked [k, B, ...] arrays; a "
                "per-batch sharding would shard the group axis — use "
                "superbatch=1 with sharding, or shard after unstacking"
            )
        if wire is not None and sharding is not None and wire.arena:
            raise ValueError(
                "the arena wire transport stages one fused buffer and "
                "cannot honor per-key shardings; use BatchWire(..., "
                "arena=False) or shard after decode"
            )
        self._decode = None
        if wire is not None and decode:
            # no donation: the packed u8 buffers never alias the decoded
            # outputs, so donating only emits "unusable" warnings
            self._decode = wire.decoder(donate=False)
        # multi-id-group models (a model's table_groups mapping): prep
        # runs per group and emits prefixed metadata; the adaptive
        # bucket policy is single-group only — multi-group preps run
        # lossless (uq length = the group's position count, constant
        # across batches, so the step's shape-driven bucket is stable)
        self.groups = groups
        if groups is not None and policy is not None:
            raise ValueError(
                "AdaptiveBucket policy is single-group; pass policy=None "
                "with groups (per-group buckets can be passed to "
                "make_batch_sort directly)"
            )
        self._lock = threading.Lock()
        self._make_prep()

    def _make_prep(self):
        policy = self.policy
        encode = self.wire.encode if self.wire is not None else None

        if not self.host_prep:
            # device-prep mode: no host sort; optional wire encode +
            # periodic bucket audit (the step's inline prep would
            # silently drop ids past a too-small bucket)
            import itertools

            counter = itertools.count()
            audit = self.audit_every

            def prep(raw):
                if policy is not None and audit and next(counter) % audit == 0:
                    nu = int(np.unique(np.asarray(raw["ids"])).size)
                    policy.observe(nu)
                    if nu > policy.bucket:
                        raise BucketOverflow(nu, policy.bucket)
                return encode(raw) if encode is not None else dict(raw)

            self._prep = prep
            return

        bucket = policy.bucket if policy is not None else None
        base = make_batch_sort(
            self.field_size, unique_bucket=bucket, minimal=self.minimal,
            groups=self.groups,
        )

        if policy is None:
            self._prep = (
                base if encode is None else (lambda raw: encode(base(raw)))
            )
            return

        def prep(raw):
            out = base(raw)
            # distinct count = final unique index + 1 (uidx_sorted is
            # the run-length cumsum the prep just built)
            policy.observe(int(out["uidx_sorted"][-1]) + 1)
            # trim the sentinel-padded unique buffer to the bucket: the
            # step derives its static bucket from this length, so a
            # regrow is just a shape change (automatic re-trace), and
            # the host->device copy shrinks from N to bucket entries
            if out["uq_ids"].shape[0] > policy.bucket:
                out["uq_ids"] = out["uq_ids"][: policy.bucket]
            return out if encode is None else encode(out)

        self._prep = prep

    def _prep_supervised(self, raw):
        """Prep with re-bucket-and-retry on overflow (thread-safe: the
        pool may hit the same overflow concurrently from two workers)."""
        while True:
            try:
                return self._prep(raw)
            except BucketOverflow as e:
                with self._lock:
                    if e.n_unique > self.policy.bucket:  # not already grown
                        new = self.policy.grow(e.n_unique)
                        self._make_prep()
                        if self.on_grow is not None:
                            self.on_grow(new)

    def __iter__(self):
        prep = self._prep_supervised if self.policy is not None else self._prep
        pool = HostPrepPool(self.source, prep, self.workers, self.depth)
        src = iter(pool)
        counts = None
        if self.superbatch > 1:
            src = _stack_groups(src, self.superbatch, self.pad_tail)
            if self.pad_tail and self.device:
                # keep the per-group real-batch count HOST-side: staging
                # it would make the consumer's int() a device fetch —
                # one full link round trip per supergroup
                counts = []

                def strip(it_):
                    for sb in it_:
                        sb = dict(sb)
                        counts.append(int(sb.pop("__sb_n__")))
                        yield sb

                src = strip(src)
        it = src if not self.device else iter(PrefetchToDevice(
            src, depth=self.prefetch_depth, sharding=self.sharding
        ))
        if counts is not None:
            def reattach(it_):
                for sb in it_:
                    out = dict(sb)
                    out["__sb_n__"] = counts.pop(0)
                    yield out

            it = reattach(it)
        if self.superbatch > 1 and self.unstack:
            it = _unstack_groups(it)
        if self._decode is None:
            return it
        return (self._decode(b) for b in it)
