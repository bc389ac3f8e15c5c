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


def test_fused_location_scale_matches_xla_exactly():
    """Same standard draws through the fused kernel and the XLA path give
    identical log-weights (f32 tolerance), for Gaussian and t families."""
    from viabel_tpu.models import funnel_model
    from viabel_tpu.ops import (fused_location_scale_lw_stats,
                                normal_base_logpdf_rows,
                                student_t_base_logpdf_rows)
    from viabel_tpu.ops.row_models import funnel_rows
    from viabel_tpu import (mean_field_gaussian_variational_family,
                            mean_field_t_variational_family)

    m = funnel_model()
    mean = jnp.asarray([0.1, -0.2], jnp.float32)
    ls = jnp.asarray([-0.4, -0.3], jnp.float32)
    vp = jnp.concatenate([mean, ls])

    z = jax.random.normal(jax.random.PRNGKey(0), (20000, 2),
                          dtype=jnp.float32)
    lw_k, stats_k = fused_location_scale_lw_stats(
        funnel_rows(), normal_base_logpdf_rows(2), z, mean, ls,
        interpret=True)
    fam = mean_field_gaussian_variational_family(2)
    x = mean + jnp.exp(ls) * z
    lw_x = m.log_prob(x) - fam.log_prob(vp, x)
    np.testing.assert_allclose(np.asarray(lw_k), np.asarray(lw_x),
                               atol=2e-4)
    np.testing.assert_allclose(float(stats_k['mean_lw']),
                               float(jnp.mean(lw_x)), rtol=1e-4)

    df = 40
    zt = jax.random.t(jax.random.PRNGKey(1), df, (20000, 2),
                      dtype=jnp.float32)
    lw_kt, _ = fused_location_scale_lw_stats(
        funnel_rows(), student_t_base_logpdf_rows(2, df), zt, mean, ls,
        interpret=True)
    famt = mean_field_t_variational_family(2, df)
    xt = mean + jnp.exp(ls) * zt
    lw_xt = m.log_prob(xt) - famt.log_prob(vp, xt)
    np.testing.assert_allclose(np.asarray(lw_kt), np.asarray(lw_xt),
                               atol=5e-4)


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
    from viabel_tpu.ops.row_models import RowModel
    for model, row_model, dim in cases:
        if not isinstance(row_model, RowModel):
            row_model = RowModel(row_model, ())
        dim_pad = max(8, -(-dim // 8) * 8)
        x = rng.randn(7, dim).astype(np.float32)
        x_rows = np.zeros((dim_pad, 7), dtype=np.float32)
        x_rows[:dim, :] = x.T
        args = [jnp.asarray(a) for a in row_model.args]
        got = np.asarray(row_model.fn(jnp.asarray(x_rows), *args))
        want = np.asarray(model.log_prob(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-4,
                                   err_msg=model.name)
