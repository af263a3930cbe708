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

The alternative modules in the reference (LayerNodeAttention_weight :10-80,
Cosine_similarity :82-153, SemanticAttention :155-250) are importable but dead
on the live path (embeddingMethod=1 uses only BitwiseMultipyLogis).  They are
provided here as selectable fusion modes (Config.fusion).  For a duplex graph
(metapath_number=2) all three reduce EXACTLY to out_l = f_l + f_o with
f_k = tanh(e_k @ trans + bias):

* LayerNodeAttention: Z = (w_o / Σ_{k≠l} w_k)·f_o and the sum has the single
  term w_o, so the learned attention weight cancels (:46-58);
* Cosine_similarity: same cancellation with w_o = cos(f_l, f_o) (:125-137);
* SemanticAttention: β = softmax over the metapath_number−1 = 1 other layer
  = [1] (:203-216).

The cancellation also makes the attention parameters' gradients identically
zero, exactly as in the reference — they are kept for parameter-count parity.
Fusion modes are dispatched on the parameter-dict key structure, which is
static under jit.
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


def _xavier(key, shape):
    """torch.nn.init.xavier_uniform_ with gain 1.414 (the reference's init for
    the attention/semantic parameters, mutil_layer_weight.py:20-21,69-75)."""
    fan_in, fan_out = shape[-2] if len(shape) > 1 else shape[-1], shape[-1]
    bound = 1.414 * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_layer_node_attention(key, dim: int):
    """LayerNodeAttention_weight parameters (reference :18-24)."""
    return {
        "trans": jnp.eye(dim, dtype=jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "attention": _xavier(key, (1, 2 * dim)),
    }


def init_cosine(key, dim: int):
    """Cosine_similarity parameters (reference :88-94)."""
    return {
        "trans": jnp.eye(dim, dtype=jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "cos_attention": _xavier(key, (1, 2 * dim)),
    }


def init_semantic(key, dim: int):
    """SemanticAttention parameters (reference :161-176)."""
    ks = jax.random.split(key, 4)
    return {
        "trans": jnp.eye(dim, dtype=jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "attention": _xavier(ks[0], (1, 2 * dim)),
        "sem_W": _xavier(ks[1], (dim, dim)),
        "sem_b": _xavier(ks[2], (1, dim)),
        "sem_q": _xavier(ks[3], (dim, 1)),
    }


FUSION_INITS = {
    "bitwise_logis": init_bitwise_logis,
    "layer_node_attention": init_layer_node_attention,
    "cosine": init_cosine,
    "semantic": init_semantic,
}


def _additive_fuse(params, e0: jnp.ndarray, e1: jnp.ndarray):
    """Shared duplex closed form of the three attention alternatives (see
    module docstring): the cross-layer weights cancel at metapath_number=2, so
    out_l = f_l + f_o exactly — value AND gradient faithful."""
    f0 = jnp.tanh(e0 @ params["trans"] + params["bias"])
    f1 = jnp.tanh(e1 @ params["trans"] + params["bias"])
    return f0 + f1, f1 + f0


def fuse(params, e0: jnp.ndarray, e1: jnp.ndarray):
    """Dispatch on the fusion parameter structure (static under jit)."""
    if "logis_w" in params:
        return bitwise_logis_fuse(params, e0, e1)
    return _additive_fuse(params, e0, e1)
