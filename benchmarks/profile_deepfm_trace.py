"""Per-op perfetto trace of the DeepFM bench step (same parser as
profile_dcn.py) — hunting unaligned-relayout reshapes like the ones
the DCN cross tower had (F*D = 39*80 = 3120; 3120 % 128 = 48)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from profile_dcn import top_ops  # noqa: E402


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dfm_trace"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mindrec_tpu.data.criteo import SyntheticCriteo
    from mindrec_tpu.models.deepfm import DeepFMConfig, DeepFMModel
    from mindrec_tpu.train import optim
    from mindrec_tpu.train.step import init_train_state, make_batch_sort, make_train_step

    cfg = DeepFMConfig(
        batch_size=16000, field_size=39, vocab_size=184_965,
        emb_dim=80, deep_layer_dim=(1024, 512, 256, 128),
        use_mixed_precision=True, sparse=True, loss_scale=1024.0,
    )
    model = DeepFMModel(cfg)
    opt = lambda: optim.adam(
        learning_rate=5e-4, eps=5e-8, loss_scale=cfg.loss_scale,
        state_dtype=jnp.bfloat16,
    )
    data = SyntheticCriteo(cfg.batch_size, 39, cfg.vocab_size, steps=8,
                           seed=0, fields="criteo")
    state = init_train_state(model, jax.random.PRNGKey(0), opt(), opt())
    step = make_train_step(model, opt(), opt(), jit=True, donate=True)
    prep = make_batch_sort(39, minimal=True)
    host = [prep(data.get_batch(s)) for s in range(8)]
    for b in host:
        b["uq_ids"] = b["uq_ids"][:131_072]
    batches = [{k: jax.device_put(v) for k, v in b.items()} for b in host]
    float(np.asarray(batches[-1]["perm"]).reshape(-1)[0])
    print("warmup...", flush=True)
    for i in range(6):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    t0 = time.perf_counter()
    for i in range(10):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    print(f"step: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)
    jax.profiler.start_trace(out_dir)
    for i in range(3):
        state, losses = step(state, batches[i % 8])
    float(losses[1])
    jax.profiler.stop_trace()
    top_ops(out_dir)


if __name__ == "__main__":
    main()
