"""GRUStack vs torch.nn.GRU: exact functional parity with copied weights.

The strongest rule-out for a recurrence bug behind the GRU4Rec quality gap
(VERDICT r2 weak-#4): load the SAME weights into torch's cuDNN-semantics GRU
(bias=False, batch_first — the reference's ``GRULayer``,
``module/layers.py:117-136``) and into our scan-based ``GRUStack``, and the
outputs must match to float32 tolerance on random inputs.

torch layout: ``weight_ih_l{k}`` is [3H, In] and ``weight_hh_l{k}`` is
[3H, H], gates ordered (reset | update | new). Ours: ``cell_{k}_wi`` kernel
[In, 3H] and ``cell_{k}/wh`` kernel [H, 3H], same gate order -> transpose.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("num_layers", [1, 2])
def test_grustack_matches_torch_gru(num_layers):
    import jax

    from dr4sr_tpu.modules.layers import GRUStack

    b, l, din, h = 4, 9, 6, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, l, din), dtype=np.float32)

    tgru = torch.nn.GRU(input_size=din, hidden_size=h, num_layers=num_layers,
                        bias=False, batch_first=True)
    with torch.no_grad():
        ref = tgru(torch.from_numpy(x))[0].numpy()

    stack = GRUStack(hidden_dim=h, num_layers=num_layers)
    variables = stack.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(np.array, variables["params"])
    sd = tgru.state_dict()
    for k in range(num_layers):
        params[f"cell_{k}_wi"]["kernel"] = (
            sd[f"weight_ih_l{k}"].numpy().T.copy()
        )
        params[f"cell_{k}"]["wh"]["kernel"] = (
            sd[f"weight_hh_l{k}"].numpy().T.copy()
        )
    out = np.asarray(stack.apply({"params": params}, x))

    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_gru_init_scale_matches_torch_default():
    """Weights init at U(-1/sqrt(H), 1/sqrt(H)) like torch's nn.GRU default
    (the reference never re-inits GRU weights; utils/utils.py:70-81)."""
    import jax

    from dr4sr_tpu.modules.layers import GRUStack

    h = 64
    stack = GRUStack(hidden_dim=h, num_layers=1)
    variables = stack.init(jax.random.PRNGKey(1),
                           np.zeros((2, 5, 16), np.float32))
    bound = 1.0 / np.sqrt(h)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        a = np.asarray(leaf)
        assert a.min() >= -bound - 1e-7 and a.max() <= bound + 1e-7
        # genuinely uniform at this scale, not normal(0.02)
        assert a.std() > 0.4 * bound
