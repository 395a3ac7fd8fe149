"""Host-resident embedding tables — the reference's CPU-target regime.

Reference: under parameter-server training without the device cache, the
embedding lookup runs with ``target="CPU"`` and the sparse optimizer
applies server/host-side (``models/wide_deep/src/wide_and_deep.py:217``
CPU-target EmbeddingLookup; ``:431-433`` ``optimizer.target="CPU"``).
The device never holds the table: per step only the batch's unique rows
travel device-ward, gradients travel back, and the optimizer state
lives with the table on the host.

TPU-native execution model (mirrors ``train/cached.py``'s split):

* tables + optimizer state live in :class:`HostTier`s (RAM with an SSD
  spill cap) or :class:`RemoteTier`s (PS servers) — beyond-HBM vocab;
* per step (host): unique the batch ids (padded to a static
  ``unique_bucket``), read the unique rows from the tiers;
* per step (device, ONE jitted fn): expand unique rows to positions,
  run the model forward/backward, apply the DENSE param updates, and
  return the summed per-unique-row gradients;
* per step (host): FTRL/LazyAdam row updates in numpy against the
  tier-resident state — the reference's host-side optimizer.

Numerics match the device sparse path exactly (same update equations);
``tests/test_host_target.py`` pins that parity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mindrec_tpu.ops.cache import HostTier
from mindrec_tpu.train.step import flatten_params, is_wide_key


def _np_ftrl(g, w, accum, linear, lr, l1, l2, loss_scale):
    g = g.astype(np.float64) / loss_scale
    accum_new = accum + g * g
    sigma = (np.sqrt(accum_new) - np.sqrt(accum)) / lr
    linear_new = linear + g - sigma * w
    quad = np.sqrt(accum_new) / lr + 2.0 * l2
    w_new = np.where(
        np.abs(linear_new) > l1, (np.sign(linear_new) * l1 - linear_new) / quad, 0.0
    )
    return (w_new.astype(np.float32), accum_new.astype(np.float32),
            linear_new.astype(np.float32))


def _np_adam(g, w, m, v, step, lr, b1, b2, eps, loss_scale):
    g = g.astype(np.float64) / loss_scale
    lr_t = lr * np.sqrt(1.0 - b2**step) / (1.0 - b1**step)
    m_new = b1 * m + (1.0 - b1) * g
    v_new = b2 * v + (1.0 - b2) * g * g
    w_new = w - lr_t * m_new / (np.sqrt(v_new) + eps)
    return (w_new.astype(np.float32), m_new.astype(np.float32),
            v_new.astype(np.float32))


class HostTargetAdapter:
    """Trains a model whose ``table_specs`` tables (specs declare
    ``target="host"``) live entirely on the host.

    Parameters
    ----------
    model : zoo model (single id group); its table specs give dims
    opt_w / opt_d : the framework optimizers — their ``kind``/``hyper``
        select the host-side update rule (ftrl / adam)
    unique_bucket : static per-batch distinct-id bound (compile shape)
    ram_bytes / spill_dir / remote_addrs : tier placement knobs
    """

    def __init__(self, model, vocab_size: int, unique_bucket: int,
                 opt_w, opt_d, ram_bytes=None, spill_dir=None,
                 remote_addrs=None, seed: int = 0,
                 matmul_dtype=jnp.bfloat16):
        self.model = model
        self.bucket = unique_bucket
        self.opt_w, self.opt_d = opt_w, opt_d
        self.tables = {}
        self.tiers = {}
        self._adam_steps = {}
        for name, (path, spec) in model.table_specs.items():
            key = "/".join(map(str, path))
            wide = is_wide_key(key)
            opt = opt_w if wide else opt_d
            states = (
                ("accum", "linear") if opt.kind == "ftrl" else ("m", "v")
            )
            self.tables[name] = (path, spec, opt)
            self._adam_steps[name] = 0
            d = spec.emb_dim

            def mk(tname, std, bias):
                if remote_addrs:
                    from mindrec_tpu.ops.remote import RemoteTier

                    return RemoteTier(remote_addrs, tname, d, init_std=std,
                                      seed=seed, init_bias=bias)
                init = None
                if std == 0.0:
                    init = lambda n, b=bias, dd=d: np.full((n, dd), b, np.float32)
                return HostTier(vocab_size, d, ram_bytes, spill_dir,
                                init_fn=init, seed=seed)

            tiers = {"param": mk(f"host.{name}", 0.01, 0.0)}
            for s in states:
                bias = (
                    float(opt.hyper.get("initial_accum", 1.0))
                    if s == "accum" else 0.0
                )
                tiers[s] = mk(f"host.{name}.{s}", 0.0, bias)
            self.tiers[name] = tiers
        self._device_fn = None
        self._matmul_dtype = matmul_dtype

    # -- device side -----------------------------------------------------

    def _build_device_fn(self, sens: float):
        model = self.model
        names = list(self.tables)
        dims = [self.tables[n][1].emb_dim for n in names]
        mdt = self._matmul_dtype

        def fn(dense_params, rows_stack, uidx, batch):
            # rows_stack: [U, sum(D)] f32; uidx: [B*F] positions->unique
            B, F = batch["wts"].shape

            def loss_fn(dense_params, rows_stack):
                pos = rows_stack.astype(mdt)[uidx]  # [B*F, sum(D)]
                rows, off = {}, 0
                for n, d in zip(names, dims):
                    rows[n] = pos[:, off : off + d].reshape(B, F, d)
                    off += d
                logits = model.apply_rows(dense_params, rows, batch["wts"],
                                          train=True)
                lw, ldd = model.loss(dense_params, logits, batch["label"])
                return ldd * sens, (lw, ldd)

            (gd, g_rows), (lw, ldd) = jax.grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(dense_params, rows_stack)
            return gd, g_rows, lw, ldd

        return jax.jit(fn)

    # -- one training step ------------------------------------------------

    def train_step(self, state, batch):
        """state: TrainState holding ONLY dense params (tables absent).
        Returns (state', (loss_w, loss_d))."""
        sens = float(getattr(self.model.config, "loss_scale", 1.0))
        if self._device_fn is None:
            self._device_fn = self._build_device_fn(sens)

        ids = np.asarray(batch["ids"], np.int64).reshape(-1)
        uq, uidx = np.unique(ids, return_inverse=True)
        if uq.size > self.bucket:
            raise RuntimeError(
                f"unique ids {uq.size} exceed unique_bucket {self.bucket}"
            )
        uq_pad = np.zeros(self.bucket, np.int64)
        uq_pad[: uq.size] = uq

        # host reads: unique rows per table, stacked along the dim axis
        parts = [
            self.tiers[n]["param"].read(uq_pad) for n in self.tables
        ]
        rows_stack = jnp.asarray(np.concatenate(parts, axis=1))

        gd, g_rows, lw, ldd = self._device_fn(
            state.params, rows_stack, jnp.asarray(uidx.astype(np.int32)),
            {k: batch[k] for k in ("wts", "label")},
        )

        # dense updates on device (ordinary leaf updates)
        flat, treedef = flatten_params(state.params)
        gflat = treedef.flatten_up_to(gd)
        new_leaves, new_w, new_d = [], dict(state.opt_w), dict(state.opt_d)
        for (key, p), g in zip(flat, gflat):
            opt = self.opt_w if is_wide_key(key) else self.opt_d
            st = new_w if is_wide_key(key) else new_d
            p2, s2 = opt.update_leaf(g, st[key], p)
            st[key] = s2
            new_leaves.append(p2)
        params2 = treedef.unflatten(new_leaves)

        # host-side row optimizer (reference optimizer.target="CPU")
        g_rows = np.asarray(g_rows, np.float64)
        off = 0
        for n, (path, spec, opt) in self.tables.items():
            d = spec.emb_dim
            g = g_rows[: uq.size, off : off + d]
            off += d
            tiers = self.tiers[n]
            w = tiers["param"].read(uq)
            h = opt.hyper
            if opt.kind == "ftrl":
                accum = tiers["accum"].read(uq)
                lin = tiers["linear"].read(uq)
                w2, a2, l2_ = _np_ftrl(
                    g, w, accum, lin, h["learning_rate"], h["l1"], h["l2"],
                    h["loss_scale"],
                )
                tiers["param"].write(uq, w2)
                tiers["accum"].write(uq, a2)
                tiers["linear"].write(uq, l2_)
            else:  # adam / lazy_adam
                self._adam_steps[n] += 1
                m = tiers["m"].read(uq)
                v = tiers["v"].read(uq)
                w2, m2, v2 = _np_adam(
                    g, w, m, v, self._adam_steps[n], h["learning_rate"],
                    h["b1"], h["b2"], h["eps"], h["loss_scale"],
                )
                tiers["param"].write(uq, w2)
                tiers["m"].write(uq, m2)
                tiers["v"].write(uq, v2)

        state = state._replace(params=params2, opt_w=new_w, opt_d=new_d,
                               step=state.step + 1)
        return state, (lw, ldd)

    def read_rows(self, table_name: str, ids) -> np.ndarray:
        return self.tiers[table_name]["param"].read(np.asarray(ids, np.int64))

    # -- eval --------------------------------------------------------------

    def eval_step(self, dense_params, batch):
        """(probs, labels) with host-gathered rows (RecModel.eval shape)."""
        if getattr(self, "_eval_fn", None) is None:
            model = self.model
            names = list(self.tables)
            dims = [self.tables[n][1].emb_dim for n in names]

            def fn(dense_params, rows_stack, uidx, wts):
                B, F = wts.shape
                pos = rows_stack[uidx]
                rows, off = {}, 0
                for n, d in zip(names, dims):
                    rows[n] = pos[:, off : off + d].reshape(B, F, d)
                    off += d
                logits = model.apply_rows(dense_params, rows, wts, train=False)
                return jax.nn.sigmoid(logits)

            self._eval_fn = jax.jit(fn)
        ids = np.asarray(batch["ids"], np.int64).reshape(-1)
        uq, uidx = np.unique(ids, return_inverse=True)
        uq_pad = np.zeros(self.bucket, np.int64)
        uq_pad[: uq.size] = uq
        parts = [self.tiers[n]["param"].read(uq_pad) for n in self.tables]
        rows_stack = jnp.asarray(np.concatenate(parts, axis=1))
        probs = self._eval_fn(
            dense_params, rows_stack, jnp.asarray(uidx.astype(np.int32)),
            jnp.asarray(batch["wts"]),
        )
        return probs, batch["label"]


def init_dense_state(model, key, opt_w, opt_d):
    """TrainState over the DENSE params only (tables host-resident)."""
    pkey, rkey = jax.random.split(
        jax.random.PRNGKey(key) if isinstance(key, int) else key
    )
    params = model.init(pkey)
    table_paths = {tuple(p) for p, _ in model.table_specs.values()}

    def strip(node, prefix=()):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if tuple(prefix + (k,)) in table_paths:
                continue
            out[k] = strip(v, prefix + (k,))
        return out

    dense = strip(params)
    flat, _ = flatten_params(dense)
    opt_w_state = {k: opt_w.init_leaf(p) for k, p in flat if is_wide_key(k)}
    opt_d_state = {k: opt_d.init_leaf(p) for k, p in flat if not is_wide_key(k)}
    from mindrec_tpu.train.step import TrainState as TS

    return TS(params=dense, opt_w=opt_w_state, opt_d=opt_d_state,
              step=jnp.zeros((), jnp.int32), rng=rkey)
