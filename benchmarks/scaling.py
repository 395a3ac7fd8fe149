"""Wide&Deep throughput scaling over a device mesh.

Reproduces the shape of the reference's scaling table
(``benchmarks/README.md:76-80``: 267,558 / 767,663 / 1,163,636
samples/s at 1 / 4 / 8 V100s) for the TPU framework: DP over the
``data`` mesh axis, global batch = per-device batch x data-parallel
size.

Run on real hardware when a multi-chip slice is attached; on this
single-chip dev box it still exercises the full sharded compile path
with ``--platform cpu --devices 8`` (virtual mesh — numbers then only
validate scaling *shape*, not absolute throughput).

Prints one JSON line per device count:
  {"metric": "wide_deep_train_samples_per_sec", "devices": N,
   "value": ..., "unit": "samples/s", "scaling_vs_1": ...}
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


import argparse
import json
import os
import sys
import time



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=16000)
    ap.add_argument("--vocab-size", type=int, default=5_860_000)
    ap.add_argument("--emb-dim", type=int, default=16)
    ap.add_argument("--field-size", type=int, default=39)
    ap.add_argument("--layers", type=int, default=7)
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--device-counts", default=None,
                    help="comma list, default: 1,...,all")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=None,
                    help="with --platform cpu: virtual host device count")
    args = ap.parse_args()

    if args.platform == "cpu" and args.devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from mindrec_tpu.data.criteo import SyntheticCriteo
    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.parallel.mesh import make_mesh, shard_batch, shard_train_state
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_train_step

    n_all = len(jax.devices())
    counts = (
        [int(x) for x in args.device_counts.split(",")]
        if args.device_counts
        else sorted({1, min(4, n_all), n_all})
    )
    base = None
    for nd in counts:
        if nd > n_all:
            print(f"# skip {nd} devices (have {n_all})", file=sys.stderr)
            continue
        cfg = WideDeepConfig(
            batch_size=args.per_device_batch * nd,
            field_size=args.field_size,
            vocab_size=args.vocab_size,
            emb_dim=args.emb_dim,
            deep_layer_dim=tuple([args.hidden] * args.layers),
            use_mixed_precision=True,
            sparse=True,
            loss_scale=1024.0,
        )
        mesh = make_mesh(data=nd, model=1, devices=jax.devices()[:nd])
        model = WideDeepModel(cfg, mesh=mesh)
        opt_w = optim.ftrl(loss_scale=cfg.loss_scale)
        opt_d = optim.lazy_adam(loss_scale=cfg.loss_scale, state_dtype=jnp.bfloat16)
        state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
        data = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size, steps=4)
        with mesh:
            state = shard_train_state(state, model, mesh)
            batches = [shard_batch(data.get_batch(s), mesh) for s in range(4)]
            step = make_train_step(model, opt_w, opt_d, jit=True, donate=False)
            for i in range(args.warmup):
                state, losses = step(state, batches[i % 4])
            float(losses[1])
            t0 = time.perf_counter()
            for i in range(args.steps):
                state, losses = step(state, batches[i % 4])
            float(losses[1])
            dt = time.perf_counter() - t0
        sps = args.steps * cfg.batch_size / dt
        if base is None:
            base = sps
        print(
            json.dumps(
                {
                    "metric": "wide_deep_train_samples_per_sec",
                    "devices": nd,
                    "value": round(sps, 1),
                    "unit": "samples/s",
                    "scaling_vs_1": round(sps / base, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
