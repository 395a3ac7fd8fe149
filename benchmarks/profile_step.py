"""Break down the Wide&Deep sparse train step cost on the real chip."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.ops.sparse import unique_pad
from mindrec_tpu.train import optim


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return out


def main():
    cfg = WideDeepConfig(
        batch_size=16000, field_size=39, vocab_size=5_860_000, emb_dim=16,
        deep_layer_dim=(1024,) * 7, use_mixed_precision=True, sparse=True,
        loss_scale=1024.0,
    )
    model = WideDeepModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    data = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size, steps=1)
    b = {k: jax.device_put(v) for k, v in data.get_batch(0).items()}
    ids = b["ids"]
    N = ids.size

    # 1. unique
    uq_fn = jax.jit(lambda x: unique_pad(x, size=N, fill_value=cfg.vocab_size))
    uq = timeit("unique_pad (624k ids)", uq_fn, ids)

    # 2. gather unique rows
    gather_fn = jax.jit(lambda t, i: (t[i],))
    timeit("gather deep rows [624k,16]", gather_fn, params["deep"]["table"], uq.ids)

    # 3. forward+backward from rows (dense params only)
    def fwd_bwd(params, rows_w, rows_d, inv, wts, label):
        def loss_fn(p, rw, rd):
            rows = {"wide": rw[inv], "deep": rd[inv]}
            logits = model.apply_rows(p, rows, wts, train=True)
            loss = jnp.mean(
                jnp.maximum(logits, 0) - logits * label + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
            return loss
        return jax.grad(loss_fn, argnums=(0, 1, 2))(params, rows_w, rows_d)

    fb = jax.jit(fwd_bwd)
    rows_w = params["wide"]["table"][uq.ids]
    rows_d = params["deep"]["table"][uq.ids]
    timeit("fwd+bwd (MLP + scatter-add)", fb, params, rows_w, rows_d, uq.inverse, b["wts"], b["label"])

    # 4. scatter update (adam rows on deep table)
    opt = optim.lazy_adam(loss_scale=1024.0)
    st = opt.init_leaf(params["deep"]["table"])
    upd = jax.jit(lambda g, i, s, t: opt.update_rows(g, i, s, t))
    g = jnp.ones((N, cfg.emb_dim), jnp.float32)
    timeit("lazy_adam update_rows [624k,16]", upd, g, uq.ids, st, params["deep"]["table"])

    # 5. pure MLP fwd
    def mlp_only(p, x):
        return model._mlp(p["deep"]["mlp"], x, False, None)
    x = jnp.ones((cfg.batch_size, cfg.field_size * cfg.emb_dim), jnp.float32)
    timeit("MLP forward only", jax.jit(mlp_only), params, x)


if __name__ == "__main__":
    main()
