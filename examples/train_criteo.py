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
    ap.add_argument("--ckpt_dir", default="./ckpt")
    ap.add_argument("--ckpt_interval", type=int, default=0,
                    help="save every N steps (0 = off); keep --ckpt_keep")
    ap.add_argument("--ckpt_keep", type=int, default=5)
    ap.add_argument("--async_ckpt", type=lambda s: s.lower() == "true",
                    default=False,
                    help="write checkpoints on a background thread "
                    "(AsyncCheckpointer): the trainer never blocks on disk")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint in --ckpt_dir and "
                    "continue (the recovery half of the elastic story: "
                    "run under examples/run_elastic_train.sh and a crashed "
                    "trainer restarts from its last save)")
    ap.add_argument("--unique_bucket", type=int, default=0,
                    help="enable the async host input pipeline "
                    "(data/pipeline.py: native prep pool -> device "
                    "prefetch, adaptive regrow) with this distinct-ids "
                    "bound; 0 = off.  Plain sparse regime only — the "
                    "cache/host-target/dynamic adapters translate ids "
                    "after prep would run")
    ap.add_argument("--prep_placement", default="host",
                    choices=["host", "device", "auto"],
                    help="with --unique_bucket: where the sort prep "
                    "runs.  'device' ships compact-packed raw batches "
                    "(data/wire.py) and derives metadata on-chip — the "
                    "transfer-bound recipe; 'auto' probes the "
                    "host->device bandwidth and picks")
    args, rest = ap.parse_known_args()

    import os

    import jax

    if os.environ.get("MINDREC_PLATFORM"):
        # the TPU-plugin sitecustomize pre-imports jax, so JAX_PLATFORMS
        # alone is too late; this env knob works like eval_criteo.py's
        jax.config.update("jax_platforms", os.environ["MINDREC_PLATFORM"])

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

    if args.unique_bucket and (
        getattr(cfg, "vocab_cache_size", 0)
        or getattr(cfg, "parameter_server", False)
        or getattr(cfg, "dynamic_embedding", False)
    ):
        raise SystemExit(
            "--unique_bucket (host input pipeline) is incompatible with "
            "the cache/host-target/dynamic regimes: their adapters "
            "translate ids AFTER prep would have sorted the raw ids"
        )
    placement, wire = args.prep_placement, None
    if placement != "host":
        if not args.unique_bucket:
            raise SystemExit("--prep_placement device/auto needs "
                             "--unique_bucket")
        from mindrec_tpu.data import wire as wire_mod

        if placement == "auto":
            # transfer time of the host-prep payload vs a typical step:
            # if the link moves the metadata in <10 ms it can never
            # dominate, keep prep on the host (smaller step)
            bw = wire_mod.measure_bandwidth()
            host_payload = cfg.batch_size * cfg.field_size * 25
            placement = "host" if host_payload / bw < 0.010 else "device"
            print(f"[mindrec] prep placement auto -> {placement} "
                  f"(link {bw / 1e6:.0f} MB/s)", flush=True)
        if placement == "device":
            wire = wire_mod.BatchWire.for_sparse(
                cfg.vocab_size, cfg.batch_size, cfg.field_size
            )
    rm = RecModel(model, opt_w, opt_d,
                  unique_bucket=args.unique_bucket or None,
                  wire=wire, prep_placement=placement)
    if mesh is not None:
        rm.state = shard_train_state(rm.state, model, mesh)

    # --- embedding placement regimes (reference matrix,
    #     wide_and_deep.py:215-291) ------------------------------------
    server_hosts = [
        h.strip() for h in
        (__import__("os").environ.get("MR_SERVER_HOSTS", "")).split(",")
        if h.strip()
    ]
    if args.model == "wide_deep" and getattr(cfg, "vocab_cache_size", 0) > 0:
        # HBM-cache regime: model was built with vocab_size rows but only
        # vocab_cache_size live in HBM; misses swap through host/remote
        # tiers (reference vocab_cache_size, embedding.py:163-182)
        import functools

        from mindrec_tpu.train.cached import (
            CachedTrainingAdapter,
            cached_train_step,
        )

        mcfg_cache = type(mcfg)(**{
            **{f.name: getattr(mcfg, f.name) for f in
               __import__("dataclasses").fields(mcfg)},
            "vocab_size": cfg.vocab_cache_size,
            # cache-mode swap is a contiguous column scatter on
            # feature-major storage; the packed layout's per-element
            # (row, lane) scatter serializes on TPU
            "table_layout": "feature_major",
        })
        model = WideDeepModel(mcfg_cache)
        rm = RecModel(model, opt_w, opt_d, donate=False)
        adapter = CachedTrainingAdapter(
            model, virtual_vocab=cfg.vocab_size,
            cache_rows=cfg.vocab_cache_size,
            max_swap=cfg.batch_size * cfg.field_size + 8,
            ram_bytes=getattr(cfg, "host_ram_bytes", None) or None,
            spill_dir="./emb_spill",
            remote_addrs=server_hosts or None,
        )
        rm.train_step = functools.partial(
            cached_train_step, adapter, rm.train_step
        )
        _orig_eval = rm.eval_step

        def _cached_eval(params, batch, _rm=rm, _ad=adapter):
            prep = _ad.prepare(batch)
            _rm.state = _ad.apply_swap(_rm.state, prep)
            _ad.writeback(prep)
            return _orig_eval(_rm.state.params, _ad.transform(batch, prep))

        rm.eval_step = _cached_eval
        print(f"cache regime: {cfg.vocab_cache_size:,} HBM rows of "
              f"{cfg.vocab_size:,} (remote={bool(server_hosts)})", flush=True)
    elif args.model == "wide_deep" and getattr(cfg, "parameter_server", False):
        # host/CPU-target regime: tables never enter HBM
        # (reference wide_and_deep.py:217 + optimizer target CPU :431-433)
        from mindrec_tpu.train.host_target import (
            HostTargetAdapter,
            init_dense_state,
        )

        adapter = HostTargetAdapter(
            model, vocab_size=cfg.vocab_size,
            unique_bucket=cfg.batch_size * cfg.field_size,
            opt_w=opt_w, opt_d=opt_d,
            remote_addrs=server_hosts or None,
            spill_dir=None if server_hosts else "./emb_spill",
        )
        rm.state = init_dense_state(model, 0, opt_w, opt_d)
        rm.train_step = adapter.train_step
        rm.eval_step = adapter.eval_step
        print(f"host-target regime: tables host-resident "
              f"(remote={bool(server_hosts)})", flush=True)
    elif getattr(cfg, "dynamic_embedding", False):
        # hash dynamic-vocab regime: arbitrary int64 ids -> dense arena
        # slots via the (optionally server-sharded) hash store
        # (reference HashEmbeddingLookup, embedding.py:47-206)
        from mindrec_tpu.train.dynamic import DynamicEmbeddingAdapter

        dyn = DynamicEmbeddingAdapter(
            capacity=cfg.vocab_size,
            permit_filter_value=getattr(cfg, "permit_filter_value", 1) or 1,
            evict_filter_value=getattr(cfg, "evict_filter_value", 0) or 0x7FFFFFFF,
            remote_addrs=server_hosts or None,
        )
        _train0 = rm.train_step
        _eval0 = rm.eval_step
        rm.train_step = lambda state, batch: _train0(
            state, dyn.transform_batch(batch)
        )
        rm.eval_step = lambda params, batch: _eval0(
            params, dyn.transform_batch(batch)
        )
        print(f"dynamic-embedding regime: arena {cfg.vocab_size:,} slots "
              f"(remote={bool(server_hosts)})", flush=True)

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
        # sparse models also report achieved samples/s vs the analytic
        # HBM/MXU floor (utils/profiling.sparse_step_floor)
        TimeMonitor(speed_of_light=model if cfg.sparse else None,
                    batch_size=cfg.batch_size),
        EvalCallback(rm, make_data(train=False), cfg.eval_file_name),
    ]
    if args.ckpt_interval > 0:
        from mindrec_tpu.train.callbacks import CheckpointCallback

        callbacks.append(CheckpointCallback(
            args.ckpt_dir, save_steps=args.ckpt_interval,
            keep_max=args.ckpt_keep, async_save=args.async_ckpt,
        ))
    if args.resume:
        from mindrec_tpu.io.checkpoint import latest_checkpoint, restore_checkpoint

        path, ck_step = latest_checkpoint(args.ckpt_dir, rank=jax.process_index())
        if path:
            rm.state = restore_checkpoint(path, rm.state)
            print(f"resumed from {path} (step {int(rm.state.step)})", flush=True)
        else:
            print("resume requested but no checkpoint found; starting fresh",
                  flush=True)
    if os.environ.get("MINDREC_CRASH_AT_STEP"):
        from mindrec_tpu.train.callbacks import FaultInjector

        callbacks.append(FaultInjector(
            int(os.environ["MINDREC_CRASH_AT_STEP"]),
            once_marker=os.environ.get("MINDREC_CRASH_MARKER"),
        ))

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
