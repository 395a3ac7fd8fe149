"""Deep & Cross Network (DCN), TPU-native.

Functional re-design of the reference
(``models/deep_and_cross/src/deep_and_cross.py:117-370``):

* ``cross_layer_num`` (default 6) explicit cross layers:
  ``y = x0 * (x_l @ w) + b + x_l`` with ``w, b`` of size ``[d]``
  (``deep_and_cross.py:139-149``) — note the rank-1 structure: the
  per-layer cost is two [B,d] GEMVs, not a [d,d] matmul;
* a parallel deep tower (2 layers of 1024) over the same input;
* final dense over ``concat(deep_out, cross_out)``
  (``deep_and_cross.py:293-309``);
* loss: plain mean sigmoid-CE (``deep_and_cross.py:311-330``);
* single Adam optimizer with sens loss-scale
  (``deep_and_cross.py:342-353``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from mindrec_tpu.models.wide_deep import ACTS, _dense_init, sigmoid_cross_entropy
from mindrec_tpu.ops.embedding import EmbeddingLookup, EmbeddingTableSpec


@dataclasses.dataclass(frozen=True)
class DCNConfig:
    """Defaults = reference DeepCrossConfig
    (``models/deep_and_cross/src/config.py:58-83``)."""

    batch_size: int = 16000
    field_size: int = 39
    vocab_size: int = 200000
    emb_dim: int = 27
    deep_layer_dim: Sequence[int] = (1024, 1024)
    cross_layer_num: int = 6
    deep_layer_act: str = "relu"
    keep_prob: float = 1.0
    dropout_flag: bool = False
    use_mixed_precision: bool = False
    sparse: bool = False
    # one-hot matmul gather (reference ``deep_and_cross.py:188-203``);
    # on TPU this routes the lookup through the MXU — useful for small
    # vocabs where a [B*F, V] @ [V, D] matmul beats a gather
    use_one_hot_embeddings: bool = False
    loss_scale: float = 1.0
    learning_rate: float = 1e-4
    init_args: tuple = (-0.01, 0.01)
    table_slice_mode: str = "none"  # shard the table over the "model" axis


class DCNModel:
    WIDE_KEYS = ()

    def __init__(self, config: DCNConfig, mesh=None):
        self.config = config
        self.mesh = mesh
        c = config
        self.emb_spec = EmbeddingTableSpec(
            vocab_size=c.vocab_size,
            emb_dim=c.emb_dim,
            name="dcn_embedding",
            sparse=c.sparse,
            init_args=c.init_args,
            slice_mode=c.table_slice_mode,
            layout=getattr(c, "table_layout", "auto"),
        )
        self.lookup = EmbeddingLookup(self.emb_spec, mesh)
        self.input_size = c.field_size * c.emb_dim
        dims = [self.input_size, *c.deep_layer_dim]
        self.mlp_dims = list(zip(dims[:-1], dims[1:]))
        self.act = ACTS[c.deep_layer_act]

    @property
    def table_specs(self):
        return {"emb": (("emb", "table"), self.emb_spec)}

    def init(self, key) -> dict:
        c = self.config
        n_cross = c.cross_layer_num
        keys = jax.random.split(key, 2 + n_cross + len(self.mlp_dims))
        d = self.input_size
        cross = []
        for i in range(n_cross):
            kw, kb = jax.random.split(keys[1 + i])
            cross.append(
                {
                    "w": 0.01 * jax.random.normal(kw, (d,), jnp.float32),
                    "b": 0.01 * jax.random.normal(kb, (d,), jnp.float32),
                }
            )
        mlp = [
            _dense_init(k, i, o)
            for k, (i, o) in zip(keys[1 + n_cross :], self.mlp_dims)
        ]
        k_final = keys[-1]
        final = _dense_init(k_final, d + c.deep_layer_dim[-1], 1)
        return {
            "emb": {"table": self.lookup.init(keys[0])},
            "cross": cross,
            "mlp": mlp,
            "final": final,
        }

    def _cross_net(self, cross_params, x0):
        """x_{l+1} = x0 * (x_l @ w_l) + b_l + x_l   (rank-1 cross).

        Runs in a 128-lane-aligned padded space: the input width
        ``F*D`` (reference recipe: 39*27 = 1053) is not a multiple of
        the TPU's 128-lane tile, and the unpadded chain costs ~10
        relayout reshapes at ~0.52 ms each fwd+bwd (~5 ms of the 24 ms
        step — ``benchmarks/PROFILE_r03.md`` §2b).  Padding once keeps
        every layer's elementwise/GEMV chain tile-aligned; the math is
        identical because the padded lanes of ``x0``/``w``/``b`` are
        zero, so they contribute nothing to ``x_l @ w`` and stay zero
        through the recurrence."""
        d = x0.shape[1]
        dp = -d % 128
        xp = jnp.pad(x0, ((0, 0), (0, dp))) if dp else x0
        x = xp
        for layer in cross_params:
            w = jnp.pad(layer["w"], (0, dp)) if dp else layer["w"]
            b = jnp.pad(layer["b"], (0, dp)) if dp else layer["b"]
            # xlw: [B]; einsum keeps the same dtype promotion as the
            # unpadded chain
            xlw = jnp.einsum("bd,d->b", x, w)
            x = xp * xlw[:, None] + b[None, :] + x
        return x[:, :d] if dp else x

    def _deep_net(self, mlp_params, x, train, rng):
        c = self.config
        dtype = jnp.bfloat16 if c.use_mixed_precision else jnp.float32
        h = x.astype(dtype)
        for layer in mlp_params:
            h = jnp.dot(h, layer["w"].astype(dtype)) + layer["b"].astype(dtype)
            h = self.act(h)
        return h.astype(jnp.float32)

    def apply_rows(self, params, rows, wts, train=False, rng=None):
        # keep the [B,F,D] mask multiply at the rows' precision (an f32
        # mask would promote the step's widest tensor, doubling traffic)
        vx = rows["emb"] * wts[:, :, None].astype(rows["emb"].dtype)
        x0 = vx.reshape(-1, self.input_size)
        deep_out = self._deep_net(params["mlp"], x0, train, rng)
        cross_out = self._cross_net(params["cross"], x0)
        h = jnp.concatenate([deep_out, cross_out], axis=1)
        return jnp.dot(h, params["final"]["w"]) + params["final"]["b"]

    def apply(self, params, ids, wts, train=False, rng=None):
        c = self.config
        if c.use_one_hot_embeddings:
            if c.sparse:
                raise ValueError("use_one_hot_embeddings requires a dense table")
            table = params["emb"]["table"]
            dtype = jnp.bfloat16 if c.use_mixed_precision else jnp.float32
            oh = jax.nn.one_hot(ids.reshape(-1), table.shape[0], dtype=dtype)
            rows_flat = jnp.dot(oh, table.astype(dtype)).astype(jnp.float32)
            rows = {"emb": rows_flat.reshape(ids.shape + (c.emb_dim,))}
        else:
            rows = {"emb": self.lookup(params["emb"]["table"], ids)}
        return self.apply_rows(params, rows, wts, train, rng)

    def apply_batch(self, params, batch, train=False, rng=None):
        return self.apply(params, batch["ids"], batch["wts"], train, rng)

    def predict_batch(self, params, batch):
        return self.predict(params, batch["ids"], batch["wts"])

    def loss(self, params, logits, label):
        ce = jnp.mean(sigmoid_cross_entropy(logits, label))
        return ce, ce

    def predict(self, params, ids, wts):
        return jax.nn.sigmoid(self.apply(params, ids, wts, train=False))
