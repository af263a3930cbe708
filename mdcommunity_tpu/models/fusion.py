"""Cross-layer fusion modules (the reference's MRGNN family).

The live configuration is BitwiseMultipyLogis (reference:
MRGNN/mutil_layer_weight.py:252-301, instantiated at
MultiDismantler_torch.py:112-114): each row (node or virtual node) borrows
representation from the other duplex layer, weighted by a learned logistic score
of the elementwise product of the two layers' transformed embeddings.

Math per row x with layer embeddings e_0, e_1 (predicting layer l):
  f_k   = tanh(e_k @ trans + bias)                       (:270-273)
  s_k   = f_k * f_l                (elementwise, k=l gives f_l*f_l, :294-301)
  a_k   = sigmoid(s_k @ w + b)                           (LogisticVector :304-313)
  w_k   = softmax over k of a_k                          (:279)
  out_l = f_l + Σ_{k≠l} w_k * f_k                        (:280-284)

The alternative modules in the reference (LayerNodeAttention_weight,
Cosine_similarity, SemanticAttention) are imported but dead on the live path
(embeddingMethod=1 uses only BitwiseMultipyLogis); we implement the live one and
keep the registry extensible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_bitwise_logis(key, dim: int):
    """Parameters of BitwiseMultipyLogis: trans starts at identity, bias at zero
    (reference :262-264); the logistic head uses a small uniform init akin to
    torch.nn.Linear's default."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(dim)
    return {
        "trans": jnp.eye(dim, dtype=jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "logis_w": jax.random.uniform(k1, (dim, 1), jnp.float32, -bound, bound),
        "logis_b": jax.random.uniform(k2, (1,), jnp.float32, -bound, bound),
    }


def bitwise_logis_fuse(params, e0: jnp.ndarray, e1: jnp.ndarray):
    """Fuse two layers' row embeddings [..., D] -> (out0, out1)."""
    f0 = jnp.tanh(e0 @ params["trans"] + params["bias"])
    f1 = jnp.tanh(e1 @ params["trans"] + params["bias"])

    def one(fl, fo):
        s_self = fl * fl
        s_other = fo * fl
        a_self = jax.nn.sigmoid(s_self @ params["logis_w"] + params["logis_b"])
        a_other = jax.nn.sigmoid(s_other @ params["logis_w"] + params["logis_b"])
        w = jax.nn.softmax(jnp.concatenate([a_self, a_other], axis=-1), axis=-1)
        return fl + w[..., 1:2] * fo

    return one(f0, f1), one(f1, f0)
