"""Normal-mixture bounds workload
(reference: notebooks/normal-mixture.ipynb): bounds-only usage of the core
API — no optimization, log-weights supplied directly."""
import sys

sys.path.insert(0, '.')

import numpy as np
from scipy.special import factorial2
from scipy.stats import norm

from viabel_tpu import all_bounds
from viabel_tpu.experiments import print_bounds


def main():
    q_var = 5
    q = norm(scale=np.sqrt(q_var))
    log_q = q.logpdf
    log_p = lambda x: np.logaddexp(norm.logpdf(x, loc=-2),
                                   norm.logpdf(x, loc=2)) - np.log(2)

    np.random.seed(918)
    samples = q.rvs(50000)
    log_weights = log_p(samples) - log_q(samples)

    print('== samples only (reference W2 = 6.08) ==')
    print_bounds(all_bounds(log_weights, samples))

    print('\n== + q_var and log_norm_bound = 0 (reference W2 = 4.41) ==')
    print_bounds(all_bounds(log_weights, samples, q_var=q_var,
                            log_norm_bound=0))

    print('\n== analytic moment bound fn (reference W2 = 2.72) ==')
    mb = lambda order: factorial2(order - 1) ** (1 / order) * np.sqrt(q_var)
    print_bounds(all_bounds(log_weights, moment_bound_fn=mb, q_var=q_var))


if __name__ == '__main__':
    main()
