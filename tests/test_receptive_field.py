"""Receptive-field probe, executable.

The reference keeps its RF measurement as a docstring recipe
(models.py:334-346: backprop a one-hot gradient from the middle output frame
and count nonzero input positions). Here it is a real test: the measured RF
of the TDS encoder must equal the analytic value

    RF = 1 + sum_i (k_i - 1) * jump_i

over the conv stack (downsample convs stride 2 double the jump; block convs
stride 1 keep it).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.models.tds import TDS


def analytic_rf(kernel, depths):
    rf = 1
    jump = 1
    for d in depths:
        rf += (kernel - 1) * jump  # downsample conv (stride 2)
        jump *= 2
        for _ in range(d):
            rf += (kernel - 1) * jump  # SAME conv, stride 1
    return rf


@pytest.mark.parametrize("kernel,depths", [(5, (1, 1, 1)), (5, (2, 1, 1))])
@pytest.mark.slow
def test_tds_receptive_field(kernel, depths):
    n_mels = 4
    sizes = (n_mels, 8, 12, 16)
    tds = TDS(input_size=n_mels, sizes=sizes, depths=depths, kernel=kernel,
              dropout=0.0)
    t = 4 * analytic_rf(kernel, depths)
    x = jnp.ones((1, t, n_mels))
    params = tds.init(jax.random.PRNGKey(0), x)
    # perturb resweights so blocks contribute to the gradient path
    params = jax.tree_util.tree_map(
        lambda v: v + 1.0 if v.ndim == 0 else v, params
    )

    def probe(xin):
        y = tds.apply(params, xin)
        mid = y.shape[1] // 2
        return jnp.sum(y[0, mid])

    grad = jax.grad(probe)(x)
    nonzero = np.nonzero(np.abs(np.asarray(grad[0]).sum(-1)) > 0)[0]
    measured = nonzero[-1] - nonzero[0] + 1
    assert measured == analytic_rf(kernel, depths), (
        measured, analytic_rf(kernel, depths)
    )


def test_production_rf_value():
    """The production encoder's analytic RF (kernel 21, depths 2,3,6) —
    the reference comments ~141 frames (models.py:95); the exact conv-stack
    value is documented here."""
    rf = analytic_rf(21, (2, 3, 6))
    # 1 + 20*(1 + 2+2 + 2 + 4*3 + 4 + 8*6) = analytic full-stack RF
    assert rf == 1 + 20 * (1 + 2 * 2 + 2 + 4 * 3 + 4 + 8 * 6)
    # sanity: the same order of magnitude as the reference's measured ~141
    # per *extract* stage; the full aggregate sees several seconds.
    assert rf > 141
