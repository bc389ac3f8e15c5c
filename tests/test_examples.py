"""Smoke tests keeping the example scripts (the notebook counterparts)
runnable; tiny sizes so they execute quickly on the CPU test mesh."""
import sys

import numpy as np
import pytest

# full example protocols: the heavy integration tier (75 s worst case)
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _repo_on_path(monkeypatch):
    monkeypatch.chdir(__file__.rsplit('/', 2)[0])
    sys.path.insert(0, '.')
    yield
    sys.path.remove('.')


def test_normal_mixture_example(capsys):
    from examples import normal_mixture
    normal_mixture.main()
    out = capsys.readouterr().out
    assert '2-Wasserstein' in out


def test_funnel_example():
    from examples import funnel
    res = funnel.main(full=False, n_iters=300, mc_samples=20000)
    assert np.isfinite(res['khat_klvi'])
    assert np.isfinite(res['khat_chivi'])


def test_robust_regression_example():
    from examples import robust_regression
    res = robust_regression.main(full=False, n_iters=300, mc_samples=20000)
    assert np.isfinite(res['khat_full'])
    assert res['W2_full'] > 0


def test_eight_schools_example():
    from examples import eight_schools
    res = eight_schools.main(full=False, n_iters=300, mc_samples=20000)
    assert np.isfinite(res['cp']['khat_klvi'])
    assert np.isfinite(res['ncp']['khat_klvi'])


def test_linear_regression_ia_example(capsys):
    from examples import linear_regression_ia
    # shrink by calling the module pieces directly with tiny settings
    import jax
    import jax.numpy as jnp
    from viabel_tpu import (black_box_klvi,
                            mean_field_gaussian_variational_family,
                            rmsprop_IA_optimize_with_rhat)
    from viabel_tpu.models import (data_generator_linear,
                                   linear_regression_model)
    data = data_generator_linear(N=50, D=3, seed=1)
    model = linear_regression_model(data['X'], data['Y'])
    fam = mean_field_gaussian_variational_family(3)
    obj = black_box_klvi(fam, model.log_prob, 30)
    out = rmsprop_IA_optimize_with_rhat(
        400, obj, jnp.zeros(6), 3, key=jax.random.PRNGKey(0),
        learning_rate=.02, n_optimisers=2, rhat_window=100,
        tail_avg_iters=100)
    np.testing.assert_allclose(out[2][0][-1], model.true_mean, atol=0.15)


def test_chivi_experiments_example():
    """The three chivi-notebook protocols (data gen -> HMC truth -> KLVI ->
    warm-started CHIVI variants) run end to end at tiny sizes."""
    from examples import chivi_experiments
    res = chivi_experiments.main(full=False, n_iters=200, mc_samples=20000)
    assert set(res) == {'chivi_expts', 'chive_expts_2', 'chive_expts_3',
                        'perturbed_klvi'}
    assert 'chivi mf-t(4.5) +1.4 (bad)' in res['chivi_expts']
    assert 'chivi_neff mf-t(8) +1.2' in res['chive_expts_3']
    for proto in res.values():
        for stage in ([proto] if 'khat' in proto else proto.values()):
            # khat = inf is a legitimate "unreliable" verdict for the
            # deliberately bad CHIVI inits at smoke-test sizes
            assert not np.isnan(stage['khat'])
            assert np.isfinite(stage['mean_err'])


def test_multistart_pipeline_example(capsys):
    from examples import multistart_pipeline
    out = multistart_pipeline.main(full=False, n_iters=5000,
                                   mc_samples=20000, n_starts=3)
    text = capsys.readouterr().out
    assert 'best by validated d2' in text
    assert 'PSIS-corrected mean' in text
    best = out['best']
    assert np.isfinite(out['bounds'][best]['d2'])
    # the winning start's corrected mean lands near the NUTS truth
    from viabel_tpu.models import robust_regression_model
    np.testing.assert_allclose(np.asarray(out['psis_mean'][best]),
                               robust_regression_model().true_mean,
                               atol=0.25)

def test_eight_schools_ia_example(capsys):
    """The eight-schools IA-rhat protocol (examples/eight_schools_ia.py;
    reference: notebooks/eight-schools-iterate-averaging-rhat.ipynb) runs
    end to end at tiny size and reports the notebook's headline numbers."""
    import jax
    from examples import eight_schools_ia
    from viabel_tpu.models import eight_schools_ncp_model
    log = eight_schools_ia.run_one(
        'NCP tiny', eight_schools_ncp_model(), n_iters=500,
        r_mean_threshold=1.15, tail_avg_iters=200,
        key=jax.random.PRNGKey(1), rhat_window=100, n_mc=30)
    out = capsys.readouterr().out
    assert 'averaging starts' in out and 'IA at least as close' in out
    assert log['r_hat_mean'].shape[0] == 5  # 500 iters / window 100
    # full-rank Gaussian protocol (eight_schools.ipynb cells 22-23)
    eight_schools_ia.run_full_rank(full=False, n_iters=400)
    out = capsys.readouterr().out
    assert 'full-rank Gaussian' in out and 'IA cov err' in out

def test_linear_regression_ia_protocol2(capsys):
    """The -2 notebook protocol (path-gradient vs plain KLVI, full-rank IA
    covariance comparison) runs end to end at tiny size."""
    from examples import linear_regression_ia
    linear_regression_ia.protocol2(full=False, n_iters=400)
    out = capsys.readouterr().out
    assert 'klvi_pd2' in out and 'rmsprop' in out and 'adam' in out
    assert 'cov dist' in out


def test_pod_layout_example(capsys):
    from examples import pod_layout
    pod_layout.main(['--quick'])
    out = capsys.readouterr().out
    assert '8-way sharded bound pass' in out
    assert '(2x4) mesh, 4 starts in one program' in out
    assert 'fetch_global -> host' in out
