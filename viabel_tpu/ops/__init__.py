"""Pallas TPU kernels for the Monte Carlo hot paths.

The reference's hot loops are (a) the optimizer iteration and (b) the
1e6-2.5e6-sample bound/PSIS estimation passes (SURVEY.md section 3.1).
Loop (a) is dominated by tiny tensors and is best served by the compiled
`lax.scan` optimizers; loop (b) is where custom kernels pay off:

* `fused_gaussian_lw_stats` — generates Gaussian family samples with the
  TPU-native PRNG *inside* the kernel (no threefry bit-twiddling, no
  (n, dim) sample array ever written to HBM), scores them against the model
  log density and the closed-form log q, and reduces CUBO/ELBO statistics
  online with running-max rescaling — the whole bound-estimation pass in one
  kernel launch.
* `streaming_lw_stats` — one-pass max+moment reduction over an existing
  log-weight vector (any family), replacing the two-pass max-then-exp-sum.

Both fall back transparently to the XLA path on non-TPU backends.

Environment note: the axon remote-compile tunnel used in this development
environment deadlocks when lowering `pltpu.prng_seed`/`prng_random_bits`
(and any kernel with loop-carried scratch state — hence the map+combine
structure of these kernels).  `fused_gaussian_lw_stats` is therefore
validated in interpreter mode and enabled on real TPU runtimes;
`streaming_lw_stats` compiles and runs on the tunnel as well.
"""
from .sample_score import (fused_gaussian_lw_stats,
                           fused_location_scale_lw_stats,
                           normal_base_logpdf_rows,
                           streaming_lw_stats,
                           student_t_base_logpdf_rows)

__all__ = ['fused_gaussian_lw_stats', 'fused_location_scale_lw_stats',
           'normal_base_logpdf_rows', 'student_t_base_logpdf_rows',
           'streaming_lw_stats']
