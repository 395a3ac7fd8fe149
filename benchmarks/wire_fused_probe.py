"""Probe: does fusing the wire decode INTO the train step help the
transfer-bound e2e path?

The wire e2e path issues three RPCs per batch through the dev tunnel:
one ``device_put`` (arena buffer), one jitted decode, one jitted step.
If the tunnel serializes dispatches, the decode call's fixed cost
(~10-20 ms class, same as the measured per-put cost —
``transfer_probe.py``) sits on the critical path.  Variant B compiles
``step(state, decode(packed))`` as ONE callable, removing a dispatch.

Run on the TPU: ``python benchmarks/wire_fused_probe.py``.
Prints ms/batch for both variants over the same fresh-host-batch
pipeline (no pre-staging, 1 prep worker, depth 3).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from mindrec_tpu.data.criteo import SyntheticCriteo, criteo_field_sizes
from mindrec_tpu.data.pipeline import AdaptiveBucket, SparseInputPipeline
from mindrec_tpu.data.wire import BatchWire
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.train import optim
from mindrec_tpu.train.step import init_train_state, make_train_step

BS, FS, VOCAB = 16000, 39, 5_860_000
WARMUP, STEPS = 3, 20


def make_pipe(total, wire, bucket, decode=True):
    data = SyntheticCriteo(BS, FS, VOCAB, steps=total, seed=0, fields="criteo")
    return SparseInputPipeline(
        (data.get_batch(s) for s in range(total)),
        field_size=FS, policy=AdaptiveBucket(bucket, log=lambda *a, **k: None),
        workers=1, depth=3, host_prep=False, wire=wire, decode=decode,
    )


def timed(step, state, it):
    for _ in range(WARMUP):
        state, losses = step(state, next(it))
    float(losses[1])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, losses = step(state, next(it))
    float(losses[1])
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    cfg = WideDeepConfig(
        batch_size=BS, field_size=FS, vocab_size=VOCAB, emb_dim=16,
        deep_layer_dim=(1024,) * 7, use_mixed_precision=True, sparse=True,
        loss_scale=1024.0,
    )
    model = WideDeepModel(cfg)
    import jax.numpy as jnp

    opt_w = optim.ftrl(loss_scale=1024.0)
    opt_d = optim.lazy_adam(loss_scale=1024.0, state_dtype=jnp.bfloat16)
    data = SyntheticCriteo(BS, FS, VOCAB, steps=8, seed=0, fields="criteo")
    bucket = AdaptiveBucket.from_sample(
        [data.get_batch(s) for s in range(8)], log=lambda *a, **k: None
    ).bucket
    wire = BatchWire.for_fields(
        criteo_field_sizes(VOCAB, FS), BS, wt_value_fields=tuple(range(13))
    )
    total = WARMUP + STEPS

    # variant A: separate decode + step dispatches (the current bench path)
    step_a = make_train_step(model, opt_w, opt_d, jit=True, donate=True,
                             unique_bucket=bucket)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    ms_a = timed(step_a, state, iter(make_pipe(total, wire, bucket)))
    print(f"A separate decode+step: {ms_a:8.2f} ms/batch "
          f"({BS / ms_a * 1e3:,.0f} samples/s)", flush=True)

    # variant B: ONE compiled callable step(state, decode(packed))
    raw_step = make_train_step(model, opt_w, opt_d, jit=False,
                               unique_bucket=bucket)
    decode = wire.decoder(jit=False)
    fused = jax.jit(lambda s, p: raw_step(s, decode(p)), donate_argnums=(0,))
    pipe = make_pipe(total, wire, bucket, decode=False)  # staged packed batches
    # prime the wire layout (decode closes over it at trace time)
    state = init_train_state(model, jax.random.PRNGKey(1), opt_w, opt_d)
    ms_b = timed(fused, state, iter(pipe))
    print(f"B fused decode-in-step: {ms_b:8.2f} ms/batch "
          f"({BS / ms_b * 1e3:,.0f} samples/s)", flush=True)
    print(f"delta: {ms_a - ms_b:+.2f} ms/batch ({ms_a / ms_b:.3f}x)")


if __name__ == "__main__":
    main()
