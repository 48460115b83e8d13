"""fscl-tpu: a TPU-native frequency-spectrum composite-likelihood sweep scanner.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C implementation (slowkoni/fscl): the Nielsen et al. 2005 composite-likelihood
selective-sweep scan with block-permutation significance testing,
ascertainment-bias correction, folded sites, and mixed sample depths
(reference: /root/reference/README.md:3-26).

Architecture (TPU-first, not a port):
  - ``models/``   probability-model construction: background SFS, ascertainment
                  bias, sweep-model tables.  Built once per run in float64
                  vectorized numpy (host); packed to dense f32 log-prob grids.
  - ``ops/``      the hot compiled compute path: batched masked-window CLR
                  evaluation over (candidate position x alpha) grids, block
                  permutation index generation.  Pure JAX/XLA + Pallas.
  - ``engine/``   genome scan orchestration: chromosome blocking, two-stage
                  search, permutation rounds with adaptive pruning, p-values,
                  checkpointing.
  - ``parallel/`` device-mesh sharding: scan points and permutation replicates
                  sharded over a ``jax.sharding.Mesh`` with psum/pmax merges
                  (replacing the reference's pthread work queues and its dead
                  master/slave stub, /root/reference/fscl-master.c).
  - ``io/``       SNP frequency file reader, ms-output parser, spectrum and
                  result writers.
  - ``sim/``      simulators for validation (sm-sample and ascbias-segments
                  equivalents, reference sm-sample.c / ascbias-segments.c).
"""

__version__ = "0.1.0"

LOG_AD_MIN = -20.0  # spline/grid domain in log(alpha*distance), fscl.h:78-80
LOG_AD_MAX = 4.0
