"""Wide&Deep CTR model, TPU-native.

Functional re-design of the reference flagship
(``models/wide_deep/src/wide_and_deep.py:72-519``):

* forward: ``wide = sum_f(w[id_f] * wt_f) + b``;
  ``deep = MLP(concat_f(emb[id_f] * wt_f))``; ``logit = wide + deep``
  (reference ``construct``, ``wide_and_deep.py:293-316``).
* MLP runs in bfloat16 end-to-end when ``use_mixed_precision`` (the
  reference casts fp16 per-layer, ``wide_and_deep.py:119-127``; staying
  bf16 across layers is the TPU-idiomatic equivalent — MXU native).
* loss: sigmoid cross-entropy; deep side adds
  ``l2_coef * sum(table^2)/2`` unless sparse/PS
  (reference ``NetWithLossClass``, ``wide_and_deep.py:337-360``).

Batch layout: ``ids [B, F] int32``, ``wts [B, F] f32``, ``label [B, 1]``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from mindrec_tpu.ops.embedding import EmbeddingLookup, EmbeddingTableSpec

ACTS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


@dataclasses.dataclass(frozen=True)
class WideDeepConfig:
    """Defaults = reference accuracy recipe
    (``models/wide_deep/default_config.yaml:14-44``)."""

    batch_size: int = 16000
    field_size: int = 39
    vocab_size: int = 200000
    emb_dim: int = 80
    deep_layer_dim: Sequence[int] = (1024, 512, 256, 128)
    deep_layer_act: str = "relu"
    keep_prob: float = 1.0
    dropout_flag: bool = False
    use_mixed_precision: bool = True
    sparse: bool = False
    dynamic_embedding: bool = False
    vocab_cache_size: int = 0
    parameter_server: bool = False
    deep_table_slice_mode: str = "none"  # none|table_row_slice|table_column_slice
    l2_coef: float = 8e-5
    loss_scale: float = 1024.0
    init_args: tuple = (-0.01, 0.01)
    table_dtype: str = "float32"  # bfloat16 halves table HBM streams
    # storage layout for sparse tables (ops/embedding.py): "auto" packs
    # unsharded device tables into 512-byte rows (fastest gather shape)
    table_layout: str = "auto"  # auto | row_packed | feature_major

    @property
    def no_l2loss(self) -> bool:
        # reference: NetWithLossClass disables l2 under PS or sparse
        # (wide_and_deep.py:337-339)
        return self.parameter_server or self.sparse or self.dynamic_embedding


def _dense_init(key, in_dim, out_dim):
    kw, kb = jax.random.split(key)
    return {
        "w": 0.01 * jax.random.normal(kw, (in_dim, out_dim), jnp.float32),
        "b": 0.01 * jax.random.normal(kb, (out_dim,), jnp.float32),
    }


class WideDeepModel:
    """Functional Wide&Deep. ``init`` builds the param pytree; forward is
    :meth:`apply` (gathers inside) or :meth:`apply_rows` (pre-gathered
    embedding rows, used by the row-sparse training path)."""

    # names used by the dual-optimizer split ("wide" prefix -> FTRL,
    # everything else -> Adam/LazyAdam) — parity with the reference's
    # name-based split (wide_and_deep.py:406-412)
    WIDE_KEYS = ("wide",)

    def __init__(self, config: WideDeepConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        c = config
        # reference regime rule (wide_and_deep.py:217): PS without the
        # device cache -> CPU/host-target lookup (tables live host-side,
        # trained by HostTargetAdapter; see train/host_target.py)
        target = (
            "host" if c.parameter_server and c.vocab_cache_size == 0
            else "device"
        )
        self.wide_spec = EmbeddingTableSpec(
            vocab_size=c.vocab_size,
            emb_dim=1,
            name="wide_embedding",
            sparse=c.sparse,
            target=target,
            init_args=c.init_args,
            dtype=c.table_dtype,
            layout=c.table_layout,
        )
        self.deep_spec = EmbeddingTableSpec(
            vocab_size=c.vocab_size,
            emb_dim=c.emb_dim,
            name="deep_embedding",
            slice_mode=c.deep_table_slice_mode,
            sparse=c.sparse,
            target=target,
            init_args=c.init_args,
            dtype=c.table_dtype,
            layout=c.table_layout,
        )
        self.wide_lookup = EmbeddingLookup(self.wide_spec, mesh)
        self.deep_lookup = EmbeddingLookup(self.deep_spec, mesh)
        dims = [c.field_size * c.emb_dim, *c.deep_layer_dim, 1]
        self.mlp_dims = list(zip(dims[:-1], dims[1:]))
        self.act = ACTS[c.deep_layer_act]

    # table specs the train step needs for the sparse path
    @property
    def table_specs(self):
        return {
            "wide": (("wide", "table"), self.wide_spec),
            "deep": (("deep", "table"), self.deep_spec),
        }

    def init(self, key) -> dict:
        keys = jax.random.split(key, 3 + len(self.mlp_dims))
        mlp = [
            _dense_init(k, i, o) for k, (i, o) in zip(keys[3:], self.mlp_dims)
        ]
        return {
            "wide": {
                "table": self.wide_lookup.init(keys[0]),
                "bias": 0.01 * jax.random.normal(keys[1], (1,), jnp.float32),
            },
            "deep": {"table": self.deep_lookup.init(keys[2]), "mlp": mlp},
        }

    # -- forward ------------------------------------------------------

    def _mlp(self, mlp_params, x, train: bool, rng=None):
        c = self.config
        dtype = jnp.bfloat16 if c.use_mixed_precision else jnp.float32
        h = x.astype(dtype)
        n = len(mlp_params)
        for i, layer in enumerate(mlp_params):
            if train and c.dropout_flag and c.keep_prob < 1.0 and rng is not None:
                rng, sub = jax.random.split(rng)
                mask = jax.random.bernoulli(sub, c.keep_prob, h.shape)
                h = jnp.where(mask, h / c.keep_prob, 0.0).astype(dtype)
            h = jnp.dot(h, layer["w"].astype(dtype)) + layer["b"].astype(dtype)
            if i < n - 1:
                h = self.act(h)
        return h.astype(jnp.float32)

    def apply_rows(self, params, rows, wts, train=False, rng=None):
        """Forward from pre-gathered rows: ``rows`` is a dict keyed by
        table name — {"wide": [B,F,1], "deep": [B,F,D]}; wts [B,F]."""
        c = self.config
        wide_rows, deep_rows = rows["wide"], rows["deep"]
        # keep the [B,F,D] elementwise work at the rows' (mixed) precision:
        # an f32 wts mask would silently promote it, doubling the HBM
        # traffic of the widest tensors in the step
        mask = wts[:, :, None].astype(deep_rows.dtype)
        wide_out = jnp.sum(
            wide_rows * wts[:, :, None].astype(wide_rows.dtype),
            axis=(1, 2), dtype=jnp.float32,
        )
        wide_out = wide_out[:, None] + params["wide"]["bias"]
        deep_in = (deep_rows * mask).reshape(-1, c.field_size * c.emb_dim)
        deep_out = self._mlp(params["deep"]["mlp"], deep_in, train, rng)
        return wide_out + deep_out  # [B, 1]

    def apply(self, params, ids, wts, train=False, rng=None):
        rows = {
            "wide": self.wide_lookup(params["wide"]["table"], ids),
            "deep": self.deep_lookup(params["deep"]["table"], ids),
        }
        return self.apply_rows(params, rows, wts, train, rng)

    def apply_batch(self, params, batch, train=False, rng=None):
        """Model-agnostic entry used by the generic train/eval steps."""
        return self.apply(params, batch["ids"], batch["wts"], train, rng)

    def predict_batch(self, params, batch):
        return self.predict(params, batch["ids"], batch["wts"])

    # -- loss ---------------------------------------------------------

    def loss(self, params, logits, label):
        """Returns (wide_loss, deep_loss) like the reference
        (``wide_and_deep.py:349-362``): both are mean sigmoid-CE; deep
        adds l2 on the deep table unless sparse/PS."""
        ce = jnp.mean(sigmoid_cross_entropy(logits, label))
        if self.config.no_l2loss:
            return ce, ce
        l2 = 0.5 * jnp.sum(jnp.square(params["deep"]["table"].astype(jnp.float32)))
        return ce, ce + self.config.l2_coef * l2

    def predict(self, params, ids, wts):
        """Eval head (reference PredictWithSigmoid,
        ``wide_and_deep.py:495-519``)."""
        logits = self.apply(params, ids, wts, train=False)
        return jax.nn.sigmoid(logits)


def sigmoid_cross_entropy(logits, labels):
    """Numerically-stable sigmoid CE with logits (per-element)."""
    labels = labels.astype(logits.dtype)
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
