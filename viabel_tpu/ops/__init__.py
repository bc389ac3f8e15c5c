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
structure of these kernels), and this JAX version's CPU interpreter does
not implement the PRNG primitives either.  `fused_gaussian_lw_stats` is
therefore UNVALIDATED at runtime in this environment — its
transform/score/reduce structure is shared with (and tested through)
`fused_location_scale_lw_stats`, but its in-kernel PRNG path must be
exercised on a TPU runtime whose toolchain lowers the PRNG primitives
before production use.  `streaming_lw_stats` and
`fused_location_scale_lw_stats` compile and run on the tunnel.

Measured on the tunneled v5e chip (1e6 x dim-10 eight-schools pass):
XLA fused transform+score 32 ms vs `fused_location_scale_lw_stats` 698 ms —
XLA's fusion already saturates this bandwidth-bound pass, so the XLA path
is the default everywhere and the kernels are opt-in
(`VIABEL_TPU_PALLAS_STATS=1` for the stats kernel).  The PRNG variant's
advantage (no threefry, no sample materialization) applies on runtimes
where the TPU PRNG lowers.
"""
from .sample_score import (fused_gaussian_lw_stats,
                           fused_location_scale_lw_stats,
                           normal_base_logpdf_rows,
                           streaming_lw_stats,
                           student_t_base_logpdf_rows)

__all__ = ['fused_gaussian_lw_stats', 'fused_location_scale_lw_stats',
           'normal_base_logpdf_rows', 'student_t_base_logpdf_rows',
           'streaming_lw_stats']
