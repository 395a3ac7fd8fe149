"""Standalone eval entrypoint (reference ``models/wide_deep/eval.py``).

Restores a checkpoint — a single integrated file, a directory (latest is
picked), or several per-rank sliced files which are merged first
(reference strategy-ckpt merge, ``eval.py:84-105``) — and reports AUC
over the eval dataset.

Usage:
  python examples/eval_criteo.py --model wide_deep \
      --config examples/wide_deep_config.yaml \
      --ckpt ./ckpt                       # dir -> latest, file, or
  python examples/eval_criteo.py --ckpt 'ckpt/ckpt-100_rank*.npz'  # slices
"""

import argparse
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(model_name, cfg, mesh):
    """Same model-construction switch as examples/train_criteo.py."""
    from mindrec_tpu.train import optim

    if model_name == "wide_deep":
        from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel

        mcfg = WideDeepConfig(
            batch_size=cfg.batch_size, field_size=cfg.field_size,
            vocab_size=cfg.vocab_size, emb_dim=cfg.emb_dim,
            deep_layer_dim=tuple(cfg.deep_layer_dim),
            use_mixed_precision=cfg.use_mixed_precision, sparse=cfg.sparse,
            loss_scale=cfg.loss_scale,
        )
        return WideDeepModel(mcfg, mesh=mesh), optim.ftrl(), optim.adam()
    if model_name == "deepfm":
        from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel

        mcfg = DeepFMConfig(
            batch_size=cfg.batch_size, field_size=cfg.field_size,
            vocab_size=cfg.vocab_size, emb_dim=cfg.emb_dim,
        )
        return DeepFMModel(mcfg, mesh=mesh), optim.ftrl(), optim.adam()
    from mindrec_tpu.models.dcn import DCNConfig, DCNModel

    mcfg = DCNConfig(
        batch_size=cfg.batch_size, field_size=cfg.field_size,
        vocab_size=cfg.vocab_size,
    )
    return DCNModel(mcfg, mesh=mesh), optim.ftrl(), optim.adam()


def resolve_ckpt(spec: str):
    """-> (paths, sliced): dir = latest single; glob/list = rank slices."""
    p = Path(spec)
    if p.is_dir():
        from mindrec_tpu.io.checkpoint import latest_checkpoint

        path, step = latest_checkpoint(p)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {p}")
        print(f"restoring step {step}: {path}", flush=True)
        return [path], False
    matches = sorted(glob.glob(spec))
    if not matches:
        raise FileNotFoundError(spec)
    return matches, len(matches) > 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="wide_deep",
                    choices=["wide_deep", "deepfm", "dcn"])
    ap.add_argument("--config", default=str(Path(__file__).parent / "wide_deep_config.yaml"))
    ap.add_argument("--ckpt", required=True,
                    help="ckpt file, directory (latest picked), or glob of "
                         "per-rank sliced files to merge")
    ap.add_argument("--eval_file_name", default="eval.log")
    args, rest = ap.parse_known_args()

    import os

    import jax

    # MINDREC_PLATFORM=cpu forces the CPU backend (tests; sitecustomize
    # pre-imports jax so env vars alone are too late — backends are lazy)
    if os.environ.get("MINDREC_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MINDREC_PLATFORM"])

    from mindrec_tpu import RecModel
    from mindrec_tpu.config import get_config
    from mindrec_tpu.data.criteo import PackedCriteoDataset, SyntheticCriteo
    from mindrec_tpu.io.checkpoint import merge_sliced, restore_checkpoint

    cfg = get_config(args.config, rest)
    rm = RecModel(*build(args.model, cfg, None))

    paths, sliced = resolve_ckpt(args.ckpt)
    if sliced:
        print(f"merging {len(paths)} sliced checkpoints", flush=True)
        rm.state = merge_sliced(paths, rm.state)
    else:
        rm.state = restore_checkpoint(paths[0], rm.state)

    if cfg.dataset_type == "packed":
        data = PackedCriteoDataset(Path(cfg.data_path) / "test", cfg.batch_size)
    else:
        data = SyntheticCriteo(
            cfg.batch_size, cfg.field_size, cfg.vocab_size,
            steps=cfg.steps_per_epoch, seed=999,
        )
    metrics = rm.eval(data)
    line = f"EvalCallBack metric: {metrics}"
    print(line, flush=True)
    with open(args.eval_file_name, "a", encoding="utf-8") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
