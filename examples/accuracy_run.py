"""Accuracy-parity run: Wide&Deep / DeepFM on statistics-faithful
synthetic Criteo with a planted model of known Bayes AUC.

Reference oracle: AUC 0.80 on Criteo (``/root/reference/README.md:88-94``;
DeepFM 80.55%, ``models/deepfm/README.md:447-449``).  Real Criteo is not
downloadable here (zero egress), so this runs the full training system
against :class:`mindrec_tpu.data.realistic.RealisticCriteo` — published
per-column cardinalities, zipf id traffic, ~27% positive rate, planted
linear+pairwise structure with Bayes AUC ≈ 0.85-0.87 — and reports the
trained AUC against that ceiling.

Two modes:
* default (in-memory): a fixed multi-million-sample dataset is staged to
  the device once and trained for N epochs (host->device through the dev
  tunnel is ~2 MB/s, so per-step host generation would measure the
  tunnel, not the system);
* --pipeline: writes raw reference-format TSV, runs the real
  ``data/preprocess.py`` 2-pass pipeline into packed shards, and trains
  from the files — the full E2E path (used by the slow CI gate at small
  scale).

Writes per-eval lines to --log (default accuracy_run.log).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="wide_deep",
                    choices=["wide_deep", "deepfm", "dcn"])
    ap.add_argument("--vocab-scale", type=float, default=0.01,
                    help="fraction of the real criteo-kaggle cardinalities")
    ap.add_argument("--batch-size", type=int, default=16000)
    ap.add_argument("--emb-dim", type=int, default=80)
    ap.add_argument("--train-batches", type=int, default=64,
                    help="distinct staged batches (dataset size = this x "
                    "batch size)")
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--eval-every", type=int, default=5, help="epochs")
    ap.add_argument("--fresh", action="store_true",
                    help="generate a brand-new batch every step (no sample "
                    "reuse — the cleanest quality evidence; host-side "
                    "generation, so best off the dev tunnel)")
    ap.add_argument("--fresh-steps-per-epoch", type=int, default=500)
    ap.add_argument("--pipeline", action="store_true",
                    help="TSV -> preprocess -> packed shards -> train")
    ap.add_argument("--async-prep", action="store_true",
                    help="with --pipeline: feed the step through the "
                    "production input pipeline (SparseInputPipeline: "
                    "host prep pool + device staging + host-prepped "
                    "sort/unique metadata) instead of direct iteration")
    ap.add_argument("--pipeline-rows", type=int, default=200_000)
    ap.add_argument("--prepare-only", action="store_true",
                    help="with --pipeline: generate the TSV and run the "
                    "preprocess pass, then exit (host-only; lets the "
                    "data phase run while the chip is busy)")
    ap.add_argument("--eval-every-steps", type=int, default=0,
                    help="additionally eval every N train steps (the "
                    "fresh-stream protocol runs ONE pass over a large "
                    "packed dataset with --epochs 1, so per-epoch evals "
                    "alone would give a single point)")
    ap.add_argument("--work-dir", default="./accuracy_data")
    ap.add_argument("--log", default="accuracy_run.log")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from mindrec_tpu.data.realistic import RealisticCriteo, write_tsv
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.metrics import AUCMetric
    from mindrec_tpu.train.step import (
        init_train_state,
        make_eval_step,
        make_train_step,
    )

    gen = RealisticCriteo(vocab_scale=args.vocab_scale)
    if args.prepare_only:
        from mindrec_tpu.data.preprocess import preprocess

        work = Path(args.work_dir)
        if (work / "packed" / "train").exists():
            print(json.dumps({"event": "prepare_skip"}), flush=True)
            return
        t0 = time.time()
        files = write_tsv(gen, work / "raw", args.pipeline_rows)
        print(json.dumps({"event": "generate_tsv", "rows": args.pipeline_rows,
                          "elapsed_s": round(time.time() - t0, 1)}), flush=True)
        preprocess(files, str(work / "packed"), workers=8,
                   line_per_sample=100)
        print(json.dumps({"event": "preprocess_done",
                          "elapsed_s": round(time.time() - t0, 1)}), flush=True)
        return
    bayes = gen.bayes_auc(100_000)
    log = open(args.log, "a")

    def emit(rec):
        rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
        print(json.dumps(rec), flush=True)
        log.write(json.dumps(rec) + "\n")
        log.flush()

    emit({"event": "start", "model": args.model, "vocab": gen.vocab_size,
          "bayes_auc": round(bayes, 4), "pos_rate": round(gen.positive_rate(), 4),
          "batch_size": args.batch_size,
          "async_prep": bool(args.async_prep),
          "dataset_samples": args.train_batches * args.batch_size})

    # pipeline mode: preprocess remaps cats to its own id space (cat2id +
    # one OOV bucket per column), so the bound is vocab + 26 OOV ids
    vocab = gen.vocab_size + (26 if args.pipeline else 0)
    if args.model == "wide_deep":
        from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel

        cfg = WideDeepConfig(
            batch_size=args.batch_size, field_size=39, vocab_size=vocab,
            emb_dim=args.emb_dim, deep_layer_dim=(1024, 512, 256, 128),
            sparse=True, loss_scale=1024.0,
        )
        model = WideDeepModel(cfg)
        opt_w = optim.ftrl(loss_scale=cfg.loss_scale)
        opt_d = optim.lazy_adam(loss_scale=cfg.loss_scale)
    elif args.model == "deepfm":
        from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel

        cfg = DeepFMConfig(
            batch_size=args.batch_size, field_size=39, vocab_size=vocab,
            emb_dim=args.emb_dim, deep_layer_dim=(1024, 512, 256, 128),
            sparse=True, loss_scale=1024.0,
        )
        model = DeepFMModel(cfg)
        opt_w = optim.adam(learning_rate=cfg.learning_rate, eps=cfg.epsilon,
                           loss_scale=cfg.loss_scale)
        opt_d = optim.adam(learning_rate=cfg.learning_rate, eps=cfg.epsilon,
                           loss_scale=cfg.loss_scale)
    else:
        from mindrec_tpu.models.dcn import DCNConfig, DCNModel

        cfg = DCNConfig(
            batch_size=args.batch_size, field_size=39, vocab_size=vocab,
            emb_dim=min(args.emb_dim, 27), sparse=True, loss_scale=1.0,
            learning_rate=3e-4,
        )
        model = DCNModel(cfg)
        opt_w = optim.adam(learning_rate=cfg.learning_rate, loss_scale=cfg.loss_scale)
        opt_d = optim.adam(learning_rate=cfg.learning_rate, loss_scale=cfg.loss_scale)

    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=True)
    ev = make_eval_step(model)

    if args.pipeline:
        from mindrec_tpu.data.criteo import PackedCriteoDataset
        from mindrec_tpu.data.preprocess import preprocess

        work = Path(args.work_dir)
        raw = work / "raw"
        if not (work / "packed" / "train").exists():
            emit({"event": "generate_tsv", "rows": args.pipeline_rows})
            files = write_tsv(gen, raw, args.pipeline_rows)
            emit({"event": "preprocess"})
            preprocess(files, str(work / "packed"), workers=4,
                       line_per_sample=100)
        # line_per_sample must match the preprocess packing (100 here;
        # the reader's default is the reference's 1000 — a mismatch
        # silently yields batch_size/10-sample batches)
        train_ds = lambda: PackedCriteoDataset(
            work / "packed" / "train", args.batch_size, line_per_sample=100
        )
        eval_ds = lambda: PackedCriteoDataset(
            work / "packed" / "test", args.batch_size, line_per_sample=100
        )
        if args.async_prep:
            from mindrec_tpu.data.pipeline import SparseInputPipeline

            base_ds = train_ds
            # lossless prep (policy=None): constant unique shape -> one
            # compiled trace; prep pool overlaps the device step and the
            # jitted step consumes the host-prepped sort/unique metadata
            train_ds = lambda: iter(SparseInputPipeline(
                base_ds(), field_size=39, policy=None, workers=2, depth=3,
            ))
        train_batches = None
        # NOTE: preprocess remaps cat values to its own id space (cat2id
        # + per-column OOV); vocab_size above bounds it since every raw
        # id comes from the generator's fixed layout.
    else:
        train_batches = []
        if not args.fresh:
            emit({"event": "stage_batches", "n": args.train_batches})
            train_batches = [
                {k: jax.device_put(v) for k, v in gen.batch(args.batch_size, step=i).items()}
                for i in range(args.train_batches)
            ]
        eval_host = [gen.batch(args.batch_size, step=10**6 + 50 + i)
                     for i in range(args.eval_batches)]
        eval_batches = [
            {k: jax.device_put(v) for k, v in b.items()} for b in eval_host
        ]
        if train_batches:
            float(train_batches[-1]["label"][0, 0])  # fence the upload

    def run_eval():
        m = AUCMetric()
        if args.pipeline:
            for b in eval_ds():
                p, l = ev(state.params, b)
                m.update(np.asarray(p), np.asarray(l))
        else:
            for b in eval_batches:
                p, l = ev(state.params, b)
                m.update(np.asarray(p), np.asarray(l))
        return m.eval()

    t0 = time.time()
    seen = 0
    fresh_step = 0
    for ep in range(1, args.epochs + 1):
        if args.fresh:
            def fresh_iter():
                nonlocal fresh_step
                for _ in range(args.fresh_steps_per_epoch):
                    fresh_step += 1
                    yield gen.batch(args.batch_size, step=fresh_step)
            it = fresh_iter()
        else:
            it = train_ds() if args.pipeline else train_batches
        ld = None
        ep_step = 0
        for b in it:
            state, (lw, ld) = step(state, b)
            seen += args.batch_size
            ep_step += 1
            if args.eval_every_steps and ep_step % args.eval_every_steps == 0:
                auc = run_eval()
                emit({"event": "eval", "epoch": ep, "step": ep_step,
                      "samples": seen, "loss": round(float(ld), 4),
                      "auc": round(auc, 4), "bayes_auc": round(bayes, 4),
                      "elapsed_s": round(time.time() - t0, 1)})
        if ep % args.eval_every == 0 or ep == args.epochs:
            auc = run_eval()
            emit({"event": "eval", "epoch": ep, "samples": seen,
                  "loss": round(float(ld), 4), "auc": round(auc, 4),
                  "bayes_auc": round(bayes, 4),
                  "elapsed_s": round(time.time() - t0, 1)})

    final = run_eval()
    emit({"event": "final", "auc": round(final, 4),
          "bayes_auc": round(bayes, 4),
          "reference_oracle": 0.80,
          "auc_vs_bayes": round(final / bayes, 4)})


if __name__ == "__main__":
    main()
