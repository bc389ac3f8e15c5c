"""Execution smoke tests for the optional plotting helpers.

The reference's plots are notebook output (notebooks/experiments.py:94-136);
these helpers are the script counterparts.  They are exercised nowhere else
in the suite (run_experiment disables contours under test configs), so a
signature or matplotlib-API break would otherwise ship unnoticed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

matplotlib = pytest.importorskip('matplotlib')
matplotlib.use('Agg')  # headless; plt.show() becomes a no-op

from viabel_tpu import mean_field_gaussian_variational_family
from viabel_tpu.experiments import (plot_approx_and_exact_contours,
                                    plot_dist_to_opt_param, plot_history)
from viabel_tpu.models import funnel_model
from viabel_tpu.utils import format_seconds


def test_plot_history_and_dist_to_opt_param():
    hist = np.exp(-np.linspace(0, 5, 400)) + 1.0
    plot_history(hist)
    plot_history(hist, B=25, ylabel='-ELBO')
    plot_history(hist - 1.05)  # crosses zero: linear scale branch
    traj = np.cumsum(np.ones((300, 4)) * 0.01, axis=0)
    plot_dist_to_opt_param(traj, traj[-1])


def test_plot_contours_with_and_without_aux_var(tmp_path):
    model = funnel_model()
    fam = mean_field_gaussian_variational_family(2)
    vp = jnp.zeros(4)
    plot_approx_and_exact_contours(model.log_prob, fam, vp,
                                   savepath=str(tmp_path / 'c.png'))
    assert (tmp_path / 'c.png').exists()
    # aux_var appended to the parameter vector (chivi-notebook calling
    # convention; SURVEY.md section 2.3)
    plot_approx_and_exact_contours(model.log_prob, fam, jnp.zeros(3),
                                   aux_var=0.0)


def test_format_seconds():
    assert format_seconds(2.5).endswith('sec')
    assert 'milli' in format_seconds(0.005)
    assert 'micro' in format_seconds(2e-6)
