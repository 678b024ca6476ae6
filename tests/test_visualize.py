"""MSE visualization/analysis tests (reference visualize.py parity):
hadamard involution, ARC-beats-plain on outlier data, monotone
evolution."""

import jax
import jax.numpy as jnp
import numpy as np

from arcquant_tpu.evals.visualize import (hadamard_transform,
                                          measure_mse, mse_evolution)
from tests.test_numerics import synthetic_outlier_x


def test_hadamard_involution():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 256))
    back = hadamard_transform(hadamard_transform(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_hadamard_blockwise():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    back = hadamard_transform(hadamard_transform(x, 64), 64)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_arc_beats_plain_nvfp4_on_outliers():
    x = synthetic_outlier_x(jax.random.PRNGKey(2), 64, 512)
    ridx = jnp.arange(512, dtype=jnp.int32)  # outliers planted at end
    m = measure_mse(x, ridx, 128)
    assert m["arc"] < m["nvfp4"], m


def test_mse_evolution_monotone():
    x = synthetic_outlier_x(jax.random.PRNGKey(3), 32, 512)
    ridx = jnp.arange(512, dtype=jnp.int32)
    ev = mse_evolution(x, ridx, [0, 64, 256])
    assert ev[2] < ev[1] < ev[0], ev


def test_plots_render(tmp_path):
    x = synthetic_outlier_x(jax.random.PRNGKey(4), 16, 128)
    ridx = jnp.arange(128, dtype=jnp.int32)
    recs = [measure_mse(x, ridx, 64) for _ in range(2)]
    from arcquant_tpu.evals.visualize import (plot_layer_mse,
                                              plot_channel_error)
    p1 = str(tmp_path / "mse.png")
    p2 = str(tmp_path / "chan.png")
    plot_layer_mse(recs, p1)
    plot_channel_error(x, p2)
    import os
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0
