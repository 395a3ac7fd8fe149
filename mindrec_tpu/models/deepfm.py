"""DeepFM CTR model, TPU-native.

Functional re-design of the reference
(``models/deepfm/src/deepfm.py:152-368``):

* linear term: ``sum_f(w[id_f] * wt_f)``;
* FM pairwise term via the sum-square − square-sum identity
  (``deepfm.py:222-228``): ``0.5 * sum_d((sum_f v)^2 - sum_f v^2)``;
* deep tower: MLP over the flattened masked embeddings;
* loss: mean sigmoid-CE + ``l2_coef/2 * (||w||^2 + ||V||^2)``
  (``deepfm.py:240-259``);
* single Adam optimizer, lr 5e-4, eps 5e-8, loss_scale 1024
  (``models/deepfm/default_config.yaml:30-33``).

In this framework the single-optimizer setup falls out of the dual-split
naturally: no param path contains "wide", so every param routes to the
deep optimizer.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from mindrec_tpu.models.wide_deep import ACTS, _dense_init, sigmoid_cross_entropy
from mindrec_tpu.ops.embedding import EmbeddingLookup, EmbeddingTableSpec


@dataclasses.dataclass(frozen=True)
class DeepFMConfig:
    """Defaults = reference config (``models/deepfm/default_config.yaml``)."""

    batch_size: int = 16000
    field_size: int = 39
    vocab_size: int = 184965
    emb_dim: int = 80
    deep_layer_dim: Sequence[int] = (1024, 512, 256, 128)
    deep_layer_act: str = "relu"
    keep_prob: float = 0.9
    # The reference's DeepFM has NO effective dropout: its DenseLayer
    # hard-codes ``Dropout(p=0.0)`` (``models/deepfm/src/deepfm.py:115``)
    # and the model passes ``keep_prob`` into the unused ``scale_coef``
    # ctor slot (``deepfm.py:186-194``), so keep_prob never reaches the
    # dropout op.  Parity default is therefore off; flip this on to get
    # real inverted dropout at ``keep_prob``.
    dropout_flag: bool = False
    use_mixed_precision: bool = True  # convert_dtype: True
    sparse: bool = False
    l2_coef: float = 8e-5
    loss_scale: float = 1024.0
    learning_rate: float = 5e-4
    epsilon: float = 5e-8
    init_args: tuple = (-0.01, 0.01)
    table_dtype: str = "float32"  # bfloat16 halves table HBM streams
    table_layout: str = "auto"  # auto | row_packed | feature_major
    table_slice_mode: str = "none"  # shard fm_v over the "model" axis


class DeepFMModel:
    """Functional DeepFM (see module docstring)."""

    WIDE_KEYS = ()

    def __init__(self, config: DeepFMConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        c = config
        self.w_spec = EmbeddingTableSpec(
            vocab_size=c.vocab_size, emb_dim=1, name="fm_w", sparse=c.sparse,
            init_args=c.init_args, dtype=c.table_dtype,
            layout=c.table_layout,
        )
        self.v_spec = EmbeddingTableSpec(
            vocab_size=c.vocab_size, emb_dim=c.emb_dim, name="fm_v",
            sparse=c.sparse, init_args=c.init_args, dtype=c.table_dtype,
            layout=c.table_layout,
            slice_mode=c.table_slice_mode,
        )
        self.w_lookup = EmbeddingLookup(self.w_spec, mesh)
        self.v_lookup = EmbeddingLookup(self.v_spec, mesh)
        dims = [c.field_size * c.emb_dim, *c.deep_layer_dim, 1]
        self.mlp_dims = list(zip(dims[:-1], dims[1:]))
        self.act = ACTS[c.deep_layer_act]

    @property
    def table_specs(self):
        return {
            "linear": (("linear", "table"), self.w_spec),
            "fm": (("fm", "table"), self.v_spec),
        }

    def init(self, key) -> dict:
        keys = jax.random.split(key, 2 + len(self.mlp_dims))
        mlp = [_dense_init(k, i, o) for k, (i, o) in zip(keys[2:], self.mlp_dims)]
        return {
            "linear": {"table": self.w_lookup.init(keys[0])},
            "fm": {"table": self.v_lookup.init(keys[1])},
            "mlp": mlp,
        }

    def _mlp(self, mlp_params, x, train: bool, rng=None):
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

    def apply_rows(self, params, rows, wts, train=False, rng=None):
        c = self.config
        w_rows, v_rows = rows["linear"], rows["fm"]
        B, F, D = wts.shape[0], c.field_size, c.emb_dim
        # elementwise FM work stays at the rows' (mixed) precision — an
        # f32 mask would promote every widest-tensor intermediate,
        # doubling its HBM traffic; reductions accumulate in f32
        mask = wts[:, :, None]
        linear_out = jnp.sum(
            w_rows * mask.astype(w_rows.dtype), axis=(1, 2), dtype=jnp.float32
        )[:, None]  # [B,1]
        # FM + deep tower share ONE flat masked tensor.  The mask is
        # applied in the rows' native [B*F, D] layout and the
        # per-sample field sum runs on the MXU via a tiled-identity
        # matmul — no [B,F,D] tensor exists, so XLA emits neither the
        # lane-repadding reshape copies nor the {2,1,0}->{0,2,1}
        # transpose a middle-axis reduce forces (~2 ms of the 18 ms
        # step at bs 16000; benchmarks/PROFILE_r02.md).
        vxN = v_rows.reshape(B * F, D) * wts.reshape(B * F, 1).astype(
            v_rows.dtype
        )
        deep_in = vxN.reshape(B, F * D)
        eye = jnp.eye(D, dtype=deep_in.dtype)
        field_sum = jax.lax.dot(
            deep_in, jnp.tile(eye, (F, 1)),
            preferred_element_type=jnp.float32,
        )  # [B, D] = sum_f vx  (exact: eye entries are 1.0, f32 accum)
        v1 = jnp.sum(jnp.square(field_sum), axis=1)  # sum_d (sum_f v)^2
        v2 = jnp.sum(
            jnp.square(vxN.astype(jnp.float32)), axis=1
        ).reshape(B, F).sum(axis=1)  # sum_{f,d} v^2
        fm_out = (0.5 * (v1 - v2))[:, None]  # [B,1]
        deep_out = self._mlp(params["mlp"], deep_in, train, rng)
        return linear_out + fm_out + deep_out

    def apply(self, params, ids, wts, train=False, rng=None):
        rows = {
            "linear": self.w_lookup(params["linear"]["table"], ids),
            "fm": self.v_lookup(params["fm"]["table"], ids),
        }
        return self.apply_rows(params, rows, wts, train, rng)

    def apply_batch(self, params, batch, train=False, rng=None):
        return self.apply(params, batch["ids"], batch["wts"], train, rng)

    def predict_batch(self, params, batch):
        return self.predict(params, batch["ids"], batch["wts"])

    def loss(self, params, logits, label):
        ce = jnp.mean(sigmoid_cross_entropy(logits, label))
        if self.config.sparse:
            # no dense-table l2 on the sparse path (tables may be huge);
            # the reference has no sparse DeepFM mode to mirror here
            return ce, ce
        l2 = 0.5 * (
            jnp.sum(jnp.square(params["linear"]["table"].astype(jnp.float32)))
            + jnp.sum(jnp.square(params["fm"]["table"].astype(jnp.float32)))
        )
        loss = ce + self.config.l2_coef * l2
        return loss, loss

    def predict(self, params, ids, wts):
        return jax.nn.sigmoid(self.apply(params, ids, wts, train=False))
