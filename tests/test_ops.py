"""Pallas kernel tests (interpreter mode on CPU; the real-TPU path is
exercised by bench.py and the verify drive)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viabel_tpu.bounds import log_weight_stats
from viabel_tpu.ops import streaming_lw_stats

_KEYS = ['log_rescale', 'mean_rescaled_alpha', 'std_rescaled_alpha',
         'mean_lw', 'std_lw']


@pytest.mark.parametrize('n', [100, 32768, 100000])
def test_streaming_lw_stats_interpret_matches_xla(n):
    lw = 1.5 * jax.random.normal(jax.random.PRNGKey(n), (n,),
                                 dtype=jnp.float32)
    a = streaming_lw_stats(lw, interpret=True)
    b = log_weight_stats(lw)
    for k in _KEYS:
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=2e-5,
                                   err_msg=k)
    assert a['n'] == b['n'] == n


def test_streaming_lw_stats_alpha3(n=50000):
    lw = jax.random.normal(jax.random.PRNGKey(1), (n,), dtype=jnp.float32)
    a = streaming_lw_stats(lw, alpha=3.0, interpret=True)
    b = log_weight_stats(lw, alpha=3.0)
    for k in _KEYS:
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=2e-5,
                                   err_msg=k)


def test_streaming_lw_stats_f64_falls_back():
    lw = jax.random.normal(jax.random.PRNGKey(2), (1000,), dtype=jnp.float64)
    a = streaming_lw_stats(lw)
    b = log_weight_stats(lw)
    for k in _KEYS:
        np.testing.assert_allclose(float(a[k]), float(b[k]), rtol=1e-12)


def test_row_models_match_column_models():
    """Row-layout kernels' model adapters agree with the zoo models."""
    from viabel_tpu.models import (eight_schools_cp_model,
                                   eight_schools_ncp_model, funnel_model,
                                   robust_regression_model,
                                   robust_regression_notebook_data)
    from viabel_tpu.ops.row_models import (eight_schools_cp_rows,
                                           eight_schools_ncp_rows,
                                           funnel_rows, regression_rows)
    from viabel_tpu.models.eight_schools import (EIGHT_SCHOOLS_SIGMA,
                                                 EIGHT_SCHOOLS_Y)

    rng = np.random.RandomState(0)
    x_data, y_data = robust_regression_notebook_data()
    cases = [
        (funnel_model(), funnel_rows(), 2),
        (robust_regression_model(),
         regression_rows(x_data, y_data, df=40.0), 2),
        (eight_schools_cp_model(),
         eight_schools_cp_rows(EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA), 10),
        (eight_schools_ncp_model(),
         eight_schools_ncp_rows(EIGHT_SCHOOLS_Y, EIGHT_SCHOOLS_SIGMA), 10),
    ]
    for model, row_fn, dim in cases:
        dim_pad = max(8, -(-dim // 8) * 8)
        x = rng.randn(7, dim).astype(np.float32)
        x_rows = np.zeros((dim_pad, 7), dtype=np.float32)
        x_rows[:dim, :] = x.T
        got = np.asarray(row_fn(jnp.asarray(x_rows)))
        want = np.asarray(model.log_prob(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-4,
                                   err_msg=model.name)
