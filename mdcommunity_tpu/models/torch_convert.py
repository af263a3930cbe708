"""Convert reference PyTorch checkpoints (state_dicts) into our parameter pytree.

The reference saves bare `state_dict()`s (MultiDismantler_torch.SaveModel :787-789)
with keys:
  w_n2l, p_node_conv, p_node_conv2, p_node_conv3, h1_weight, h2_weight, last_w,
  cross_product, w_layer1, w_layer2,
  layerNodeAttention_weight.{trans, bias, logis.parameter.weight, logis.parameter.bias}

`last_w` aliases `h2_weight` when reg_hidden > 0 (net :69) and is dropped.  The
logistic head is a torch Linear ([out, in] weight) and is transposed to our
matmul convention.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def state_dict_to_params(sd: Dict) -> Dict:
    def arr(k):
        v = sd[k]
        # torch tensors expose .numpy(); allow plain arrays for testing
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    prefix = "layerNodeAttention_weight"
    params = {
        "w_n2l": arr("w_n2l"),
        "p_node_conv": arr("p_node_conv"),
        "p_node_conv2": arr("p_node_conv2"),
        "p_node_conv3": arr("p_node_conv3"),
        "h1_weight": arr("h1_weight"),
        "h2_weight": arr("h2_weight"),
        "cross_product": arr("cross_product"),
        "w_layer1": arr("w_layer1"),
        "w_layer2": arr("w_layer2"),
        "fusion": {
            "trans": arr(f"{prefix}.trans"),
            "bias": arr(f"{prefix}.bias"),
            "logis_w": arr(f"{prefix}.logis.parameter.weight").T,
            "logis_b": arr(f"{prefix}.logis.parameter.bias"),
        },
    }
    # HCA-architecture checkpoints (HCA net __init__: w_n2l [3, 64] + macro /
    # decoder heads).  NB: the capsule's non-SMOKE HCA model dirs contain
    # BASE-architecture state_dicts (14 keys, w_n2l [2, 64]) that the HCA net
    # cannot load — only the SMOKE dir holds genuine HCA weights.
    for k in ("w_macro", "w_comm_score", "w_micro_score"):
        if k in sd:
            params[k] = arr(k)
    return params


def load_torch_checkpoint(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return state_dict_to_params(sd)


def params_to_state_dict(params: Dict) -> Dict:
    """Inverse mapping (for exporting to the reference format)."""
    import torch

    def t(x):
        return torch.tensor(np.asarray(x))

    out = {
        "w_n2l": t(params["w_n2l"]),
        "p_node_conv": t(params["p_node_conv"]),
        "p_node_conv2": t(params["p_node_conv2"]),
        "p_node_conv3": t(params["p_node_conv3"]),
        "h1_weight": t(params["h1_weight"]),
        "h2_weight": t(params["h2_weight"]),
        "last_w": t(params["h2_weight"]),
        "cross_product": t(params["cross_product"]),
        "w_layer1": t(params["w_layer1"]),
        "w_layer2": t(params["w_layer2"]),
        "layerNodeAttention_weight.trans": t(params["fusion"]["trans"]),
        "layerNodeAttention_weight.bias": t(params["fusion"]["bias"]),
        "layerNodeAttention_weight.logis.parameter.weight": t(
            np.asarray(params["fusion"]["logis_w"]).T
        ),
        "layerNodeAttention_weight.logis.parameter.bias": t(
            params["fusion"]["logis_b"]
        ),
    }
    return out
