"""Alternative cross-layer fusion modes (reference MRGNN/mutil_layer_weight.py).

Validates the duplex (metapath_number=2) closed form out_l = f_l + f_o against
the ACTUAL reference modules (LayerNodeAttention_weight :10-80 and
SemanticAttention :155-250 executed on random inputs), and that every mode
builds, runs, and trains inside the Q-network.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdcommunity_tpu.models.fusion import FUSION_INITS, fuse


def _rand_params(mode, dim, seed=0):
    p = FUSION_INITS[mode](jax.random.PRNGKey(seed), dim)
    # non-trivial trans/bias so the test is not the identity
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    p["trans"] = jax.random.normal(k1, (dim, dim)) * 0.3
    p["bias"] = jax.random.normal(k2, (dim,)) * 0.1
    return p


@pytest.mark.parametrize("refcls", ["LayerNodeAttention_weight", "SemanticAttention"])
def test_duplex_reduction_matches_reference_module(refcls):
    import sys

    sys.path.insert(0, "tests")
    from reference_harness import load_reference_modules

    load_reference_modules()
    import torch
    from MRGNN import mutil_layer_weight as mlw

    torch.manual_seed(0)
    n, d = 7, 8
    mod = getattr(mlw, refcls)(d, dropout=0.5, alpha=0.5, metapath_number=2,
                               layer_predict=0)
    e0 = torch.randn(n, d)
    e1 = torch.randn(n, d)
    nodes_ori = list(range(n))
    with torch.no_grad():
        out = mod([e0.clone(), e1.clone()], nodes_ori)
    if isinstance(out, tuple):
        out = out[0]
    with torch.no_grad():
        f0 = torch.tanh(e0 @ mod.trans + mod.bias)
        f1 = torch.tanh(e1 @ mod.trans + mod.bias)
    np.testing.assert_allclose(
        out.detach().numpy(), (f0 + f1).numpy(), rtol=1e-5, atol=1e-5,
        err_msg=f"{refcls} at metapath_number=2 should reduce to f_l + f_o",
    )


@pytest.mark.parametrize("mode", ["layer_node_attention", "cosine", "semantic"])
def test_additive_modes_value(mode):
    p = _rand_params(mode, 16)
    e0 = jax.random.normal(jax.random.PRNGKey(2), (5, 16))
    e1 = jax.random.normal(jax.random.PRNGKey(3), (5, 16))
    o0, o1 = fuse(p, e0, e1)
    f0 = jnp.tanh(e0 @ p["trans"] + p["bias"])
    f1 = jnp.tanh(e1 @ p["trans"] + p["bias"])
    np.testing.assert_allclose(np.asarray(o0), np.asarray(f0 + f1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(f1 + f0), rtol=1e-6)


@pytest.mark.parametrize("mode", list(FUSION_INITS))
def test_fusion_modes_in_qnet(mode):
    """Each fusion mode runs through init/forward/grad of the full Q-network."""
    from mdcommunity_tpu.env.env import batched_reset
    from mdcommunity_tpu.graphs.duplex import stack_graphs
    from mdcommunity_tpu.graphs.gmm import generate_pool
    from mdcommunity_tpu.models.net import init_params
    from mdcommunity_tpu.rl.dqn import predict_q

    rng = np.random.default_rng(0)
    graphs = generate_pool(rng, 2, 12, 16, 16, 128)
    gb = jax.device_put(stack_graphs(graphs))
    st = batched_reset(gb)
    params = init_params(jax.random.PRNGKey(0), fusion=mode)
    q = predict_q(params, gb, st.covered, st.sever, "unit_cost")
    assert np.isfinite(np.asarray(q)[np.isfinite(np.asarray(q))]).all()

    def loss(p):
        qq = predict_q(p, gb, st.covered, st.sever, "unit_cost")
        return jnp.sum(jnp.where(jnp.isfinite(qq), qq, 0.0))

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jnp.sum(g["fusion"]["trans"])))
