"""Train+eval the multitable Wide&Deep on Outbrain data with MAP@12.

Reference entrypoint parity:
``models/wide_and_deep_multitable/train_and_eval.py`` — 4-table model,
dual FTRL(l1=l2=5e-4, initial_accum=0.1)/Adam(eps 1e-6) optimizers with
sens 1000 (``src/wide_and_deep.py:499-614``), metric = AUC + grouped
MAP@12 by display_id (``src/metrics.py:51-107``).

Usage (synthetic smoke, CPU ok):
  python examples/train_outbrain.py --synthetic --batch_size 64 \
      --steps_per_epoch 8 --epochs 1

Real data (TFRecords written by
``mindrec_tpu.data.outbrain.write_outbrain_tfrecords``):
  python examples/train_outbrain.py --data_path /data/outbrain \
      --batch_size 131072
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--batch_size", type=int, default=131072)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--steps_per_epoch", type=int, default=8,
                    help="synthetic mode only")
    ap.add_argument("--sparse", type=lambda s: s.lower() == "true",
                    default=True, help="row-sparse grads + lazy optimizers")
    ap.add_argument("--emb128_size", type=int, default=650_000)
    ap.add_argument("--deep_layers", type=int, nargs="*",
                    default=[1024, 1024, 1024, 1024, 1024])
    ap.add_argument("--mesh_model", type=int, default=1)
    ap.add_argument("--loss_file_name", default="loss_outbrain.log")
    ap.add_argument("--eval_file_name", default="eval_outbrain.log")
    ap.add_argument("--host_prep", type=lambda s: s.lower() == "true",
                    default=False,
                    help="run the async host input pipeline (per-group "
                    "native prep pool -> device prefetch; tiny-vocab "
                    "groups skip sorting)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); the TPU-plugin "
                    "sitecustomize pre-imports jax, so the JAX_PLATFORMS "
                    "env var alone is too late")
    args = ap.parse_args()

    import os

    import jax

    platform = args.platform or os.environ.get("MINDREC_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    from mindrec_tpu import RecModel
    from mindrec_tpu.data.outbrain import OutbrainTFRecordDataset, SyntheticOutbrain
    from mindrec_tpu.models.multitable import (
        MultiTableConfig,
        MultiTableWideDeepModel,
    )
    from mindrec_tpu.parallel.dist import initialize_from_env
    from mindrec_tpu.parallel.mesh import make_mesh, shard_train_state
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.callbacks import EvalCallback, LossCallback, TimeMonitor
    from mindrec_tpu.train.metrics import AUCMetric, GroupedMapMetric

    topo = initialize_from_env()
    print(f"topology: {topo}", flush=True)

    cfg = MultiTableConfig(
        batch_size=args.batch_size,
        emb_128_size=args.emb128_size,
        deep_layer_dim=tuple(args.deep_layers),
        sparse=args.sparse,
        emb128_slice_mode="table_row_slice" if args.mesh_model > 1 else "none",
    )
    mesh = None
    if args.mesh_model > 1:
        mesh = make_mesh(model=args.mesh_model)

    model = MultiTableWideDeepModel(cfg, mesh=mesh)
    # reference multitable optimizer recipe (wide_and_deep.py:525-535)
    opt_w = optim.ftrl(learning_rate=cfg.ftrl_lr, l1=5e-4, l2=5e-4,
                       initial_accum=0.1, loss_scale=cfg.loss_scale)
    opt_d = (optim.lazy_adam if cfg.sparse else optim.adam)(
        learning_rate=cfg.adam_lr, eps=1e-6, loss_scale=cfg.loss_scale
    )
    rm = RecModel(
        model, opt_w, opt_d,
        metrics={"auc": AUCMetric(), "map12": GroupedMapMetric(k=12)},
        host_prep=args.host_prep,
    )
    if mesh is not None:
        rm.state = shard_train_state(rm.state, model, mesh)

    def make_data(train: bool):
        if args.synthetic or not args.data_path:
            return SyntheticOutbrain(
                cfg, steps=args.steps_per_epoch, seed=1 if train else 999
            )
        return OutbrainTFRecordDataset(
            args.data_path, args.batch_size, train_mode=train,
            num_shards=jax.process_count(), shard_id=jax.process_index(),
        )

    callbacks = [
        LossCallback(args.loss_file_name, per_print_times=10),
        TimeMonitor(),
        EvalCallback(rm, make_data(train=False), args.eval_file_name),
    ]
    rm.train(args.epochs, make_data(train=True), callbacks=callbacks)
    metrics = rm.eval(make_data(train=False))
    print(f"final metrics: {metrics}", flush=True)


if __name__ == "__main__":
    main()
