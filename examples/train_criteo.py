"""Train a CTR model on Criteo-format data (reference entrypoint parity:
models/wide_deep/train_and_eval.py, models/deepfm/train.py,
models/deep_and_cross/train.py — one script, --model selects).

Usage:
  python examples/train_criteo.py --model wide_deep \
      --config examples/wide_deep_config.yaml [--key value ...]

Distributed (one process per host):
  MR_SCHED_HOST=<coord> MR_SCHED_PORT=11272 MR_WORKER_NUM=<n> \
  MR_WORKER_ID=<i> python examples/train_criteo.py ... --mesh_model 2
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="wide_deep", choices=["wide_deep", "deepfm", "dcn"])
    ap.add_argument("--config", default=str(Path(__file__).parent / "wide_deep_config.yaml"))
    ap.add_argument("--mesh_model", type=int, default=1, help="model-parallel axis size")
    ap.add_argument("--enable_profiling", action="store_true",
                    help="jax.profiler trace around training "
                         "(reference moxing_adapter.py:105-111)")
    ap.add_argument("--profiler_path", default="./profiler_data")
    ap.add_argument("--save_graphs", action="store_true",
                    help="dump StableHLO/optimized HLO of the train step "
                         "(reference save_graphs=True)")
    ap.add_argument("--graphs_path", default="./graphs")
    args, rest = ap.parse_known_args()

    import jax

    from mindrec_tpu import RecModel
    from mindrec_tpu.config import get_config
    from mindrec_tpu.data.criteo import PackedCriteoDataset, SyntheticCriteo
    from mindrec_tpu.parallel.dist import initialize_from_env
    from mindrec_tpu.parallel.mesh import make_mesh, shard_train_state
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.callbacks import (
        EvalCallback,
        LossCallback,
        TimeMonitor,
    )

    topo = initialize_from_env()
    print(f"topology: {topo}", flush=True)
    cfg = get_config(args.config, rest)

    mesh = None
    if args.mesh_model > 1 or jax.device_count() > 1:
        mesh = make_mesh(model=args.mesh_model)

    if args.model == "wide_deep":
        from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel

        mcfg = WideDeepConfig(
            batch_size=cfg.batch_size, field_size=cfg.field_size,
            vocab_size=cfg.vocab_size, emb_dim=cfg.emb_dim,
            deep_layer_dim=tuple(cfg.deep_layer_dim),
            deep_layer_act=cfg.deep_layer_act, keep_prob=cfg.keep_prob,
            dropout_flag=cfg.dropout_flag,
            use_mixed_precision=cfg.use_mixed_precision, sparse=cfg.sparse,
            dynamic_embedding=cfg.dynamic_embedding,
            deep_table_slice_mode=cfg.deep_table_slice_mode,
            l2_coef=cfg.l2_coef, loss_scale=cfg.loss_scale,
        )
        model = WideDeepModel(mcfg, mesh=mesh)
        opt_w = optim.ftrl(loss_scale=mcfg.loss_scale)
        opt_d = (
            optim.lazy_adam(loss_scale=mcfg.loss_scale)
            if (mcfg.sparse or mcfg.dynamic_embedding)
            else optim.adam(loss_scale=mcfg.loss_scale)
        )
    elif args.model == "deepfm":
        from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel

        mcfg = DeepFMConfig(
            batch_size=cfg.batch_size, field_size=cfg.field_size,
            vocab_size=cfg.vocab_size, emb_dim=cfg.emb_dim,
            loss_scale=cfg.loss_scale,
        )
        model = DeepFMModel(mcfg, mesh=mesh)
        opt_w = optim.ftrl(loss_scale=mcfg.loss_scale)
        opt_d = optim.adam(
            learning_rate=mcfg.learning_rate, eps=mcfg.epsilon,
            loss_scale=mcfg.loss_scale,
        )
    else:
        from mindrec_tpu.models.dcn import DCNConfig, DCNModel

        mcfg = DCNConfig(
            batch_size=cfg.batch_size, field_size=cfg.field_size,
            vocab_size=cfg.vocab_size,
        )
        model = DCNModel(mcfg, mesh=mesh)
        opt_w = optim.ftrl()
        opt_d = optim.adam(learning_rate=mcfg.learning_rate, loss_scale=mcfg.loss_scale)

    rm = RecModel(model, opt_w, opt_d)
    if mesh is not None:
        rm.state = shard_train_state(rm.state, model, mesh)

    def make_data(train: bool):
        if cfg.dataset_type == "packed":
            sub = "train" if train else "test"
            return PackedCriteoDataset(
                Path(cfg.data_path) / sub, cfg.batch_size,
                num_shards=jax.process_count(), shard_id=jax.process_index(),
            )
        return SyntheticCriteo(
            cfg.batch_size, cfg.field_size, cfg.vocab_size,
            steps=cfg.steps_per_epoch, seed=1 if train else 999,
        )

    callbacks = [
        LossCallback(cfg.loss_file_name, per_print_times=10),
        TimeMonitor(),
        EvalCallback(rm, make_data(train=False), cfg.eval_file_name),
    ]

    if args.save_graphs:
        from mindrec_tpu.utils.profiling import dump_ir

        b0 = next(iter(make_data(train=True)))
        files = dump_ir(
            rm.train_step, rm.state, b0, path=args.graphs_path,
            name="train_step",
        )
        print(f"dumped IR: {files}", flush=True)

    profiler = None
    if args.enable_profiling:
        from mindrec_tpu.utils.profiling import Profiler

        profiler = Profiler(args.profiler_path)
    try:
        rm.train(cfg.epochs, make_data(train=True), callbacks=callbacks)
    finally:
        if profiler is not None:
            profiler.analyse()
            print(f"profiler trace -> {args.profiler_path}", flush=True)
    metrics = rm.eval(make_data(train=False))
    print(f"final metrics: {metrics}", flush=True)


if __name__ == "__main__":
    main()
