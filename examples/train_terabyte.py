"""TB-scale capability demo: train Wide&Deep with a virtual embedding
table far larger than device memory.

Reference parity point (BASELINE.md "TB-scale capability"): vocab
900,000,000 x emb_dim 240 => fp32 table ~864 GB, trained on ONE device
with a 4.6M-row HBM cache, a server RAM cap and SSD spill
(run_parameter_server_standalone_train_terabyte_scale_model.sh:35-42).

TPU-native version: the jitted step trains on a dense
[cache_rows, 240] HBM arena; the C++ LRU maps ids -> slots; missed rows
stream in from a host RAM tier capped at --ram-gb with SSD spill beyond
(or from remote table servers with --servers host:port,...).

Usage (defaults sized for a quick demo; pass the full reference scale):
  python examples/train_terabyte.py                       # quick
  python examples/train_terabyte.py --vocab 900000000 \
      --emb-dim 240 --cache-rows 4600000 --ram-gb 10      # reference point
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=900_000_000)
    ap.add_argument("--emb-dim", type=int, default=240)
    ap.add_argument("--cache-rows", type=int, default=200_000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--field-size", type=int, default=39)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--ram-gb", type=float, default=10.0)
    ap.add_argument("--spill-dir", default="/tmp/mrec_tb_spill")
    ap.add_argument("--servers", default="",
                    help="comma list of table-server host:port (remote tier)")
    ap.add_argument("--zipf", type=float, default=1.1,
                    help="id skew (power-law, like production traffic)")
    ap.add_argument("--platform", default="", help="force jax platform")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.cached import CachedTrainingAdapter, cached_train_step
    from mindrec_tpu.train.step import init_train_state, make_train_step

    table_gb = args.vocab * args.emb_dim * 4 / 2**30
    arena_gb = args.cache_rows * args.emb_dim * 4 * 3 / 2**30  # param+m+v
    print(
        f"virtual table: {args.vocab:,} x {args.emb_dim} = {table_gb:,.0f} GB fp32"
        f" | HBM arenas: {arena_gb:.2f} GB ({args.cache_rows:,} rows)"
        f" | host RAM cap {args.ram_gb} GB -> SSD {args.spill_dir}",
        flush=True,
    )

    cfg = WideDeepConfig(
        batch_size=args.batch_size, field_size=args.field_size,
        vocab_size=args.cache_rows, emb_dim=args.emb_dim,
        deep_layer_dim=(1024, 512, 256, 128), sparse=True,
        # cache-mode swap is a contiguous column scatter on
        # feature-major storage (packed rows would element-scatter)
        table_layout="feature_major",
    )
    model = WideDeepModel(cfg)
    opt_w, opt_d = optim.ftrl(loss_scale=cfg.loss_scale), optim.lazy_adam(
        loss_scale=cfg.loss_scale
    )
    state = init_train_state(model, 0, opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d)

    adapter = CachedTrainingAdapter(
        model, virtual_vocab=args.vocab, cache_rows=args.cache_rows,
        max_swap=args.batch_size * args.field_size + 8,
        ram_bytes=int(args.ram_gb * 2**30),
        spill_dir=args.spill_dir,
        remote_addrs=[s for s in args.servers.split(",") if s],
    )

    rng = np.random.default_rng(0)

    def batch():
        # zipf-distributed ids over the full 900M vocab, production-like skew
        ids = rng.zipf(args.zipf, (args.batch_size, args.field_size))
        ids = (ids - 1) % args.vocab
        return {
            "ids": ids.astype(np.int64),
            "wts": rng.uniform(0.5, 1.5, ids.shape).astype(np.float32),
            "label": rng.integers(0, 2, (args.batch_size, 1)).astype(np.float32),
        }

    for i in range(args.steps):
        b = batch()
        t0 = time.perf_counter()
        state, (lw, ld) = cached_train_step(adapter, step, state, b)
        lw = float(lw)  # fence
        dt = time.perf_counter() - t0
        uniq = len(np.unique(b["ids"]))
        print(
            f"step {i}: loss_w={lw:.4f} loss_d={float(ld):.4f} "
            f"distinct_ids={uniq} resident={len(adapter.lru)} {dt*1e3:.0f} ms",
            flush=True,
        )
    adapter.flush_all(state)
    print("flushed resident rows to tiers; demo complete", flush=True)


if __name__ == "__main__":
    main()
