"""Multitable Wide&Deep (Outbrain), TPU-native.

Functional re-design of the reference
(``models/wide_and_deep_multitable/src/wide_and_deep.py:110-560``):

* 4 embedding tables: 128-dim x 650k, 64-dim single x 17.3k,
  64-dim multi-hot x 20.9k (shared by 6 multi-hot fields), 64-dim
  indicator x 16 (``wide_and_deep.py:154-198``);
* 6 multi-hot fields are mask-multiplied then **mean over the full hot
  dim** (reference uses ReduceMean over axis 1 after masking, i.e.
  divides by max-hot length, not mask sum — ``wide_and_deep.py:302-348``);
* per-table wide weight vectors + continue-value weights
  (``wide_and_deep.py:200-214,360-425``);
* loss: both heads plain mean sigmoid-CE (``wide_and_deep.py:474-476``);
* dual optimizers: FTRL(l1=l2=5e-4, initial_accum=0.1) / Adam(eps 1e-6),
  sens 1000 (``wide_and_deep.py:525-535``);
* metric: MAP@12 grouped by display_id
  (``src/metrics.py:51-107``) — see
  ``mindrec_tpu.train.metrics.GroupedMapMetric``.

Batch layout (dict):
  continue_val [B,32] f32, indicator_id [B,Fi] i32, emb_128_id [B,F128]
  i32, emb_64_single_id [B,F64] i32, 6x (multi_<name>_id [B,Lk] i32 +
  multi_<name>_mask [B,Lk] f32), label [B,1] f32, display_id [B] i32.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from mindrec_tpu.models.wide_deep import ACTS, _dense_init, sigmoid_cross_entropy
from mindrec_tpu.ops.embedding import EmbeddingLookup, EmbeddingTableSpec

MULTI_FIELDS = (
    "doc_ad_category",
    "doc_event_entity",
    "doc_ad_entity",
    "doc_event_topic",
    "doc_event_category",
    "doc_ad_topic",
)


@dataclasses.dataclass(frozen=True)
class MultiTableConfig:
    """Defaults = reference constants (``wide_and_deep.py:154-163``)."""

    batch_size: int = 131072
    continue_field_size: int = 32
    indicator_field_size: int = 13
    emb128_field_size: int = 3
    emb64_single_field_size: int = 6
    multi_hot_sizes: Sequence[int] = (3, 10, 10, 10, 3, 3)
    emb_128_size: int = 650000
    emb64_single_size: int = 17300
    emb64_multi_size: int = 20900
    indicator_size: int = 16
    deep_layer_dim: Sequence[int] = (1024, 1024, 1024, 1024, 1024)
    deep_layer_act: str = "relu"
    keep_prob: float = 1.0
    dropout_flag: bool = False
    use_mixed_precision: bool = True
    loss_scale: float = 1000.0
    ftrl_lr: float = 5e-2
    adam_lr: float = 3.5e-4
    init_args: tuple = (-0.01, 0.01)
    sparse: bool = False  # row-sparse grads + lazy optimizers on all 8 tables
    emb128_slice_mode: str = "none"  # shard the 650k-row table over "model"

    @property
    def input_emb_dim(self) -> int:
        return (
            self.continue_field_size
            + self.indicator_field_size * 64
            + self.emb128_field_size * 128
            + self.emb64_single_field_size * 64
            + len(MULTI_FIELDS) * 64
        )


class MultiTableWideDeepModel:
    WIDE_KEYS = ("wide",)

    def __init__(self, config: MultiTableConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        c = config
        # feature-major default: the r5 full-bench measured the packed
        # layout 11% SLOWER on this model (674k vs 754k samples/s) — its
        # dim-64/128 tables gain little from 512B-row gathers while the
        # multi-group update loses the streamed fold economics
        mk = lambda name, vocab, dim, slice_mode="none": EmbeddingLookup(
            EmbeddingTableSpec(vocab_size=vocab, emb_dim=dim, name=name,
                               init_args=c.init_args, sparse=c.sparse,
                               slice_mode=slice_mode,
                               layout=getattr(c, "table_layout",
                                              "feature_major")),
            mesh,
        )
        self.emb128 = mk("emb128_embedding", c.emb_128_size, 128,
                         c.emb128_slice_mode)
        self.emb64_single = mk("emb64_single", c.emb64_single_size, 64)
        self.emb64_multi = mk("emb64_multi", c.emb64_multi_size, 64)
        self.emb64_indicator = mk("emb64_indicator", c.indicator_size, 64)
        # wide weight vectors as [V,1] tables
        self.w128 = mk("wide_emb128_w", c.emb_128_size, 1)
        self.w64_single = mk("wide_emb64_single_w", c.emb64_single_size, 1)
        self.w64_multi = mk("wide_emb64_multi_w", c.emb64_multi_size, 1)
        self.w_indicator = mk("wide_indicator_w", c.indicator_size, 1)
        dims = [c.input_emb_dim, *c.deep_layer_dim, 1]
        self.mlp_dims = list(zip(dims[:-1], dims[1:]))
        self.act = ACTS[c.deep_layer_act]

    # -- sparse-path wiring (train/step.py) -----------------------------
    # 8 tables over 4 distinct id spaces: the step sorts/uniques each id
    # group once and row-sparse-updates every table in the group
    # (reference multitable construct consumes 21 separate id columns —
    # ``wide_and_deep_multitable/src/wide_and_deep.py:271-349``).
    @property
    def table_specs(self):
        return {
            "emb128": (("deep", "emb128"), self.emb128.spec),
            "emb64_single": (("deep", "emb64_single"), self.emb64_single.spec),
            "emb64_multi": (("deep", "emb64_multi"), self.emb64_multi.spec),
            "emb64_indicator": (
                ("deep", "emb64_indicator"), self.emb64_indicator.spec
            ),
            "w128": (("wide", "emb128_w"), self.w128.spec),
            "w64_single": (("wide", "emb64_single_w"), self.w64_single.spec),
            "w64_multi": (("wide", "emb64_multi_w"), self.w64_multi.spec),
            "w_indicator": (("wide", "indicator_w"), self.w_indicator.spec),
        }

    @property
    def table_groups(self):
        return {
            "indicator": {
                "keys": ("indicator_id",),
                "tables": ("emb64_indicator", "w_indicator"),
            },
            "emb128": {"keys": ("emb_128_id",), "tables": ("emb128", "w128")},
            "emb64_single": {
                "keys": ("emb_64_single_id",),
                "tables": ("emb64_single", "w64_single"),
            },
            "multi": {
                "keys": tuple(f"multi_{n}_id" for n in MULTI_FIELDS),
                "tables": ("emb64_multi", "w64_multi"),
                # mask==0 positions contribute exactly zero gradient
                # (both towers multiply by the mask), so host prep may
                # COMPACT them out of the group's sorted backward
                # stream (train/step.py make_batch_sort kept_budget)
                "mask_keys": tuple(
                    f"multi_{n}_mask" for n in MULTI_FIELDS
                ),
            },
        }

    def init(self, key) -> dict:
        c = self.config
        keys = jax.random.split(key, 10 + len(self.mlp_dims))
        mlp = [_dense_init(k, i, o) for k, (i, o) in zip(keys[10:], self.mlp_dims)]
        return {
            "deep": {
                "emb128": self.emb128.init(keys[0]),
                "emb64_single": self.emb64_single.init(keys[1]),
                "emb64_multi": self.emb64_multi.init(keys[2]),
                "emb64_indicator": self.emb64_indicator.init(keys[3]),
                "mlp": mlp,
            },
            "wide": {
                "continue_w": 0.01
                * jax.random.normal(keys[4], (c.continue_field_size,), jnp.float32),
                "emb128_w": self.w128.init(keys[5]),
                "emb64_single_w": self.w64_single.init(keys[6]),
                "emb64_multi_w": self.w64_multi.init(keys[7]),
                "indicator_w": self.w_indicator.init(keys[8]),
                "bias": 0.01 * jax.random.normal(keys[9], (1,), jnp.float32),
            },
        }

    def _pool_matrix(self, dtype):
        """Static ``[sum(Lk), n_fields]`` field one-hot (exact at any
        dtype) + f32 ``1/Lk`` per field: one matmul + one tiny divide =
        the 6 per-field masked full-length means (reference ReduceMean,
        ``wide_and_deep_multitable/src/wide_and_deep.py:271-349``) with
        the division applied in f32 on the small pooled output, so the
        numerics match the old slice-and-mean path."""
        import numpy as np

        sizes = self.config.multi_hot_sizes
        p = np.zeros((sum(sizes), len(sizes)), np.float32)
        off = 0
        for f, lk in enumerate(sizes):
            p[off : off + lk, f] = 1.0
            off += lk
        inv_l = np.asarray([1.0 / lk for lk in sizes], np.float32)
        return jnp.asarray(p, dtype), jnp.asarray(inv_l)

    def _mlp(self, mlp_params, x, train, rng):
        c = self.config
        dtype = jnp.bfloat16 if c.use_mixed_precision else jnp.float32
        h = x.astype(dtype)
        n = len(mlp_params)
        for i, layer in enumerate(mlp_params):
            if train and c.dropout_flag and c.keep_prob < 1.0 and rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, c.keep_prob, h.shape)
                h = jnp.where(keep, h / c.keep_prob, 0.0).astype(dtype)
            h = jnp.dot(h, layer["w"].astype(dtype)) + layer["b"].astype(dtype)
            if i < n - 1:
                h = self.act(h)
        return h.astype(jnp.float32)

    def apply(self, params, batch, train=False, rng=None):
        d, w = params["deep"], params["wide"]
        B = batch["continue_val"].shape[0]

        # ---- deep tower -------------------------------------------------
        ind_emb = self.emb64_indicator(d["emb64_indicator"], batch["indicator_id"]).reshape(B, -1)
        e128 = self.emb128(d["emb128"], batch["emb_128_id"]).reshape(B, -1)
        e64s = self.emb64_single(d["emb64_single"], batch["emb_64_single_id"]).reshape(B, -1)
        pooled = []
        for name in MULTI_FIELDS:
            ids = batch[f"multi_{name}_id"]
            mask = batch[f"multi_{name}_mask"]
            emb = self.emb64_multi(d["emb64_multi"], ids)  # [B,L,64]
            # reference semantics: masked multiply then mean over the FULL
            # hot dim (divide by L, not by mask sum)
            pooled.append(jnp.mean(emb * mask[:, :, None], axis=1))
        deep_in = jnp.concatenate(
            [batch["continue_val"], ind_emb, e128, e64s, *pooled], axis=1
        )
        deep_out = self._mlp(d["mlp"], deep_in, train, rng)

        # ---- wide tower -------------------------------------------------
        val_w = jnp.sum(batch["continue_val"] * w["continue_w"][None, :], axis=1, keepdims=True)
        ind_w = jnp.sum(self.w_indicator(w["indicator_w"], batch["indicator_id"]), axis=(1, 2))[:, None]
        w128 = jnp.sum(self.w128(w["emb128_w"], batch["emb_128_id"]), axis=(1, 2))[:, None]
        w64s = jnp.sum(self.w64_single(w["emb64_single_w"], batch["emb_64_single_id"]), axis=(1, 2))[:, None]
        wm = 0.0
        for name in MULTI_FIELDS:
            ids = batch[f"multi_{name}_id"]
            mask = batch[f"multi_{name}_mask"]
            ws = self.w64_multi(w["emb64_multi_w"], ids)[:, :, 0]  # [B,L]
            wm = wm + jnp.sum(ws * mask, axis=1, keepdims=True)
        wide_out = val_w + ind_w + w128 + w64s + wm + w["bias"]

        return wide_out + deep_out  # [B,1]

    def apply_batch(self, params, batch, train=False, rng=None):
        return self.apply(params, batch, train, rng)

    def apply_rows_batch(self, params, rows, batch, train=False, rng=None):
        """Forward from pre-gathered rows (the sparse step's entry).

        ``rows`` is keyed by table name (see :attr:`table_specs`):
        deep tables give ``[B, F_g, D]``, wide tables ``[B, F_g, 1]``;
        the "multi" group's ``F_g`` is the concatenation of the 6
        multi-hot fields in ``MULTI_FIELDS`` order.
        """
        c = self.config
        w = params["wide"]
        B = batch["continue_val"].shape[0]

        # ---- deep tower ---------------------------------------------
        ind_emb = rows["emb64_indicator"].reshape(B, -1)
        e128 = rows["emb128"].reshape(B, -1)
        e64s = rows["emb64_single"].reshape(B, -1)
        # ONE masked multiply over the whole [B, sum(Lk), 64] block +
        # ONE [sum(Lk), 6] pooling matmul (entry f holds 1/Lk on field
        # f's slots) replace the 6 odd-offset slices + per-field means:
        # the slices forced [5.1M,64]-scale relayout/pad passes fwd+bwd
        # (~23 ms/step at bs 131,072 — benchmarks/PROFILE_r03.md §2);
        # the matmul computes the same masked full-length means
        # (reference ReduceMean semantics) without ever re-packing.
        multi = rows["emb64_multi"]  # [B, sum(Lk), 64]
        mask_all = jnp.concatenate(
            [batch[f"multi_{name}_mask"] for name in MULTI_FIELDS], axis=1
        )  # [B, sum(Lk)]
        masked = multi * mask_all[:, :, None].astype(multi.dtype)
        pool_p, inv_l = self._pool_matrix(multi.dtype)  # [sum(Lk), 6], [6]
        pooled_all = jnp.einsum(
            "bld,lf->bfd", masked, pool_p,
            preferred_element_type=jnp.float32,
        ) * inv_l[None, :, None]  # [B, 6, 64] field-major (old concat order)
        deep_in = jnp.concatenate(
            [batch["continue_val"], ind_emb, e128, e64s,
             pooled_all.reshape(B, -1)], axis=1
        )
        deep_out = self._mlp(params["deep"]["mlp"], deep_in, train, rng)

        # ---- wide tower ---------------------------------------------
        val_w = jnp.sum(
            batch["continue_val"] * w["continue_w"][None, :], axis=1,
            keepdims=True,
        )
        ind_w = jnp.sum(rows["w_indicator"], axis=(1, 2),
                        dtype=jnp.float32)[:, None]
        w128 = jnp.sum(rows["w128"], axis=(1, 2), dtype=jnp.float32)[:, None]
        w64s = jnp.sum(rows["w64_single"], axis=(1, 2),
                       dtype=jnp.float32)[:, None]
        # folded [V,1] tables deliver [B, F, fold] rows with only the
        # owning sublane nonzero — sum the last axis, never slice it;
        # the 6 per-field masked sums collapse to one masked reduction
        # over the concatenated hot axis (same mask_all as the deep side)
        wmulti = jnp.sum(rows["w64_multi"], axis=-1)  # [B, sum(Lk)]
        wm = jnp.sum(
            wmulti * mask_all.astype(wmulti.dtype), axis=1, keepdims=True,
            dtype=jnp.float32,
        )
        wide_out = val_w + ind_w + w128 + w64s + wm + w["bias"]
        return wide_out + deep_out.astype(jnp.float32)  # [B,1]

    def loss(self, params, logits, label):
        ce = jnp.mean(sigmoid_cross_entropy(logits, label))
        return ce, ce  # reference: both heads plain CE (no l2)

    def predict(self, params, batch):
        return jax.nn.sigmoid(self.apply(params, batch, train=False))

    def predict_batch(self, params, batch):
        return self.predict(params, batch)
