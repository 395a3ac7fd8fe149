"""Break down the Wide&Deep sparse train-step cost on the real chip.

Times the ACTUAL production pieces (streamed Pallas kernels, fused
un-permute) rather than naive XLA gathers/scatters, so the numbers sum
to roughly the full-step time printed first.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))


import time

import jax
import jax.numpy as jnp
import numpy as np

from mindrec_tpu.data.criteo import SyntheticCriteo
from mindrec_tpu.models.wide_deep import WideDeepConfig, WideDeepModel
from mindrec_tpu.train import optim
from mindrec_tpu.train.step import init_train_state, make_train_step, _permute_rows


def fence(x):
    """Fetch one scalar (block_until_ready is a no-op through the tunnel).
    Slice on-device first — np.asarray would ship the whole array."""
    leaf = jax.tree.leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0])


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:48s} {dt:8.2f} ms")
    return out


def _full_prep(ids):
    """bench.py's _device_prep: sort + inverse perm + padded uniques."""
    n = ids.size
    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_ids, perm = jax.lax.sort_key_val(ids.reshape(-1), iota)
    _, inv = jax.lax.sort_key_val(perm, iota)
    newv = jnp.concatenate([jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]])
    uidx_sorted = jnp.cumsum(newv.astype(jnp.int32)) - 1
    uq = jnp.sort(jnp.where(newv, sorted_ids, jnp.int32(2**31 - 2)))
    return sorted_ids, perm, inv, uq, uidx_sorted[inv], uidx_sorted


def main():
    cfg = WideDeepConfig(
        batch_size=16000, field_size=39, vocab_size=5_860_000, emb_dim=16,
        deep_layer_dim=(1024,) * 7, use_mixed_precision=True, sparse=True,
        loss_scale=1024.0,
    )
    model = WideDeepModel(cfg)
    opt_w = optim.ftrl(loss_scale=cfg.loss_scale)
    opt_d = optim.lazy_adam(loss_scale=cfg.loss_scale)
    state = init_train_state(model, jax.random.PRNGKey(0), opt_w, opt_d)
    data = SyntheticCriteo(cfg.batch_size, cfg.field_size, cfg.vocab_size,
                           steps=1, fields="criteo")
    import numpy as _np

    bucket = int(_np.unique(_np.asarray(data.get_batch(0)["ids"])).size * 1.2)
    b = {k: jax.device_put(v) for k, v in data.get_batch(0).items()}
    N = b["ids"].size

    @jax.jit
    def _prep(ids):
        n = ids.size
        iota = jnp.arange(n, dtype=jnp.int32)
        sorted_ids, perm = jax.lax.sort_key_val(ids.reshape(-1), iota)
        _, inv = jax.lax.sort_key_val(perm, iota)
        return sorted_ids, perm, inv

    b["sorted_ids"], b["perm"], b["inv"] = _prep(b["ids"])
    fence(b["inv"])

    # 0. full production step — bench parity: criteo-shaped ids, a
    # derived static unique bucket, and host-precomputed unique
    # metadata.  (The previous lossless-bucket ub=624000 donate=False
    # variant was a one-off program whose remote compile could run >15
    # minutes — see the tunnel-variability memory note.)
    prep_all = jax.jit(_full_prep)
    (b["sorted_ids"], b["perm"], b["inv"], b["uq_ids"], b["uidx"],
     b["uidx_sorted"]) = prep_all(b["ids"])
    fence(b["uidx"])
    step = make_train_step(model, opt_w, opt_d, jit=True, donate=False,
                           unique_bucket=bucket)
    timeit("FULL sparse step", step, state, b)

    # table specs
    specs = model.table_specs
    (wide_path, wide_spec) = specs["wide"]
    (deep_path, deep_spec) = specs["deep"]
    tw = state.params["wide"]["table"]
    td = state.params["deep"]["table"]
    print(f"  wide table {tw.shape} fold={wide_spec.fold}  deep table {td.shape} fold={deep_spec.fold}")

    from mindrec_tpu.ops.pallas.stream_gather import streamed_gather
    from mindrec_tpu.ops.pallas import stream_update as su
    from mindrec_tpu.train.step import _pick_tile

    sorted_ids = b["sorted_ids"].reshape(-1)
    cols_d = sorted_ids // deep_spec.fold if deep_spec.fold > 1 else sorted_ids
    cols_w = sorted_ids // wide_spec.fold if wide_spec.fold > 1 else sorted_ids

    # 1. device sort (what the host pipeline precomputes)
    timeit("sort ids + inverse perm (device)", _prep, b["ids"])

    # 2. streamed gathers
    g_d = timeit(
        "streamed_gather deep [Dp,Vc]",
        jax.jit(lambda t, c: streamed_gather(t, c, tile=_pick_tile(t.shape[1]))),
        td, cols_d,
    )
    g_w = timeit(
        "streamed_gather wide",
        jax.jit(lambda t, c: streamed_gather(t, c, tile=_pick_tile(t.shape[1]))),
        tw, cols_w,
    )

    # 3. fused un-permute fwd ([N, D] gather) and bwd (same-shaped gather)
    big = jnp.concatenate([g_w[:8], g_d[:16]]).T  # [N, 24]
    unperm = jax.jit(lambda x, i, p: _permute_rows(x, i, p))
    timeit("un-permute gather [624k, 24] f32", unperm, big, b["inv"].reshape(-1), b["perm"].reshape(-1))

    # 4. MLP fwd+bwd from batch-ordered rows
    rows = {
        "wide": jnp.ones((cfg.batch_size, cfg.field_size, 1), jnp.float32),
        "deep": jnp.ones((cfg.batch_size, cfg.field_size, 16), jnp.float32),
    }

    def fwd_bwd(params, rows):
        def loss_fn(p, r):
            logits = model.apply_rows(p, r, b["wts"], train=True)
            _, loss_d = model.loss(p, logits, b["label"])
            return loss_d
        return jax.grad(loss_fn, argnums=(0, 1))(params, rows)

    timeit("MLP fwd+bwd (rows precomputed)", jax.jit(fwd_bwd), state.params, rows)

    # 5. streamed optimizer updates
    g_aug_d = jnp.ones((24 + 8, N), jnp.float32)
    st_d = state.opt_d["deep/table"]
    adam = jax.jit(lambda t, m, v, c, g: su.streamed_adam_cols(
        t, m, v, c, g, jnp.float32(3.5e-4), dim=deep_spec.emb_dim,
        fold=deep_spec.fold, b1=0.9, b2=0.999, eps=1e-8, loss_scale=1024.0,
        tile=_pick_tile(td.shape[1])))
    timeit("streamed_adam deep update", adam, td, st_d["m"], st_d["v"], cols_d, g_aug_d[: td.shape[0] + 8])

    st_w = state.opt_w["wide/table"]
    g_aug_w = jnp.ones((tw.shape[0] + 8, N), jnp.float32)
    ftrl = jax.jit(lambda t, a, l, c, g: su.streamed_ftrl_cols(
        t, a, l, c, g, dim=wide_spec.emb_dim, fold=wide_spec.fold,
        learning_rate=5e-2, l1=1e-8, l2=1e-8, loss_scale=1024.0,
        tile=_pick_tile(tw.shape[1])))
    timeit("streamed_ftrl wide update", ftrl, tw, st_w["accum"], st_w["linear"], cols_w, g_aug_w)


if __name__ == "__main__":
    main()
