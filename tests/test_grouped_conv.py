"""GroupedConv1D (ops/grouped_conv.py): every lowering must match nn.Conv
bit-for-meaning, and params must be interchangeable with nn.Conv checkpoints
(same names/shapes) — the TDS encoder swaps lowerings without retraining."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tal_asrd_tpu.ops.grouped_conv import GroupedConv1D, IMPLS

B, T, G = 2, 37, 8


@pytest.mark.parametrize("impl", sorted(IMPLS))
@pytest.mark.parametrize(
    "c_in,c_out,stride,padding",
    [(16, 40, 1, "SAME"),      # TDSBlock-style (c_pg 2 -> d_pg 5)
     (8, 40, 2, "VALID"),      # downsample-style (c_pg 1)
     (24, 24, 1, "SAME")])     # square c_pg == d_pg
def test_matches_nn_conv(impl, c_in, c_out, stride, padding):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, c_in), jnp.float32)
    ref = nn.Conv(c_out, (21,), strides=(stride,), padding=padding,
                  feature_group_count=G)
    rv = ref.init(key, x)
    want = ref.apply(rv, x)

    mod = GroupedConv1D(c_out, 21, G, stride=stride, padding=padding,
                        impl=impl, pack=4)
    # nn.Conv params load directly (same names/shapes)
    got = mod.apply(rv, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_param_shapes_interchangeable():
    key = jax.random.PRNGKey(1)
    x = jnp.zeros((1, T, 16), jnp.float32)
    a = nn.Conv(40, (21,), feature_group_count=G).init(key, x)
    b = GroupedConv1D(40, 21, G).init(key, x)
    assert jax.tree_util.tree_map(lambda p: p.shape, a) == \
        jax.tree_util.tree_map(lambda p: p.shape, b)


def test_pack_must_divide_groups_falls_back():
    """pack that doesn't divide the group count: packed impl falls back to
    xla instead of crashing (width_mult experiments change G)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, T, 15), jnp.float32)
    mod = GroupedConv1D(30, 21, 5, impl="packed", pack=4)   # 5 % 4 != 0
    v = mod.init(key, x)
    ref = GroupedConv1D(30, 21, 5, impl="xla")
    np.testing.assert_allclose(np.asarray(mod.apply(v, x)),
                               np.asarray(ref.apply(v, x)), rtol=1e-6)
