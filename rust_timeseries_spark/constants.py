"""Numerical constants pinned to the reference library.

Bit-for-bit parity of rolled-up points requires these to match the
reference exactly (reference: src/optimization/loglik_optimizer/
transformations.rs:84-101, types.rs:91; src/utils.rs:135).
"""

# ∑α + ∑β + slack = 1 − STATIONARITY_MARGIN  (transformations.rs:84)
STATIONARITY_MARGIN = 1e-6

# clamp for logits before ln in to_theta (transformations.rs:90)
LOGIT_EPS = 1e-15

# eigenvalue truncation threshold for the pseudo-inverse
# (transformations.rs:98, used hessian.rs:325-344)
EIGEN_EPS = 1e-10

# generic tolerance, e.g. unit-mean innovation check (transformations.rs:101,
# innovations.rs:74)
GENERAL_TOL = 1e-10

# default L-BFGS memory (types.rs:91)
DEFAULT_LBFGS_MEM = 7

# default ψ guards (src/utils.rs:135)
DEFAULT_PSI_GUARDS = (1e-6, 1e6)

# default optimizer tolerances (traits.rs:368-377)
DEFAULT_TOL_GRAD = 1e-6
DEFAULT_MAX_ITER = 300

# softplus linearization threshold (transformations.rs:150-152)
SOFTPLUS_THRESHOLD = 20.0

# deterministic-data seed convention (reference SimOpts default seed=42,
# options.rs:404-411; TESTDATA.md seed=42)
DEFAULT_SEED = 42

# token-table generation vocabulary (FIXTURES.md F-1)
VOCAB_SIZE = 50257
