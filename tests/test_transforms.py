"""Transform-layer tests: bijection round trips, Jacobians vs autodiff, and
equivalence with the hand-written eight-schools unconstraining."""
import jax
import jax.numpy as jnp
import numpy as np

from viabel_tpu.transforms import (ParameterTransforms, identity_transform,
                                   interval_transform,
                                   lower_bounded_transform,
                                   positive_transform)


def test_round_trips_and_jacobians():
    z = jnp.asarray(np.linspace(-2, 2, 9))
    for t in [identity_transform(), positive_transform(),
              lower_bounded_transform(1.5), interval_transform(-1, 3)]:
        x = t.constrain(z)
        np.testing.assert_allclose(np.asarray(t.unconstrain(x)),
                                   np.asarray(z), rtol=1e-8,
                                   err_msg=t.name)
        # jacobian vs autodiff of the scalar map
        auto = jax.vmap(jax.grad(lambda s: t.constrain(s)))(z)
        np.testing.assert_allclose(np.asarray(t.log_det_jacobian(z)),
                                   np.log(np.abs(np.asarray(auto))),
                                   rtol=1e-6, err_msg=t.name)


def test_transformed_log_density_matches_eight_schools():
    """identity x 1, positive x 1, identity x 8 reproduces the hand-written
    eight-schools CP unconstrained density exactly."""
    from viabel_tpu.models import (EIGHT_SCHOOLS_SIGMA, EIGHT_SCHOOLS_Y,
                                   eight_schools_cp_model)
    from viabel_tpu.distributions import normal_logpdf

    y, sigma = jnp.asarray(EIGHT_SCHOOLS_Y), jnp.asarray(EIGHT_SCHOOLS_SIGMA)

    def constrained_log_density(x):
        # x = [mu, tau, theta...], tau on its natural scale
        mu, tau, theta = x[:, 0], x[:, 1], x[:, 2:]
        lp = normal_logpdf(mu, 0.0, 5.0)
        lp += -jnp.log(jnp.pi * 5.0 * (1.0 + (tau / 5.0) ** 2))
        lp += jnp.sum(normal_logpdf(theta, mu[:, None], tau[:, None]),
                      axis=-1)
        lp += jnp.sum(normal_logpdf(y[None, :], theta, sigma[None, :]),
                      axis=-1)
        return lp

    t = ParameterTransforms([identity_transform(), positive_transform()]
                            + [identity_transform()] * 8)
    lifted = t.transformed_log_density(constrained_log_density)

    model = eight_schools_cp_model()
    z = np.random.RandomState(0).randn(6, 10)
    np.testing.assert_allclose(np.asarray(lifted(jnp.asarray(z))),
                               np.asarray(model.log_prob(jnp.asarray(z))),
                               rtol=1e-10)
    # 1-D input path
    np.testing.assert_allclose(float(lifted(jnp.asarray(z[0]))),
                               float(model.log_prob(jnp.asarray(z[0]))),
                               rtol=1e-10)


def test_transformed_density_usable_in_vi():
    """The lifted density drives a KLVI optimization end-to-end."""
    from viabel_tpu import (adagrad_optimize, black_box_klvi,
                            mean_field_gaussian_variational_family)
    from viabel_tpu.distributions import normal_logpdf

    # p(x) with x[1] > 0: x0 ~ N(0,1), x1 ~ LogNormal(0, 0.5)
    def constrained(x):
        return (normal_logpdf(x[:, 0], 0.0, 1.0)
                + normal_logpdf(jnp.log(x[:, 1]), 0.0, 0.5)
                - jnp.log(x[:, 1]))

    t = ParameterTransforms([identity_transform(), positive_transform()])
    lifted = t.transformed_log_density(constrained)
    # On the unconstrained scale this is exactly N(0,1) x N(0,0.5)
    fam = mean_field_gaussian_variational_family(2)
    obj = black_box_klvi(fam, lifted, 100, presampled=True)
    opt, _, _, _ = adagrad_optimize(1500, obj, jnp.zeros(4),
                                    key=jax.random.PRNGKey(0),
                                    learning_rate=.05)
    mean, cov = map(np.asarray, fam.mean_and_cov(opt))
    np.testing.assert_allclose(mean, [0.0, 0.0], atol=0.05)
    np.testing.assert_allclose(np.sqrt(np.diag(cov)), [1.0, 0.5], atol=0.07)
