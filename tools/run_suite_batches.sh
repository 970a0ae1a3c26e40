#!/bin/sh
# Non-slow test suite in four batches, each sized to fit a <10-minute
# pytest invocation on a 1-core host (the constraint a reviewer's
# sandbox typically has — see README "Testing" for the tier map).
# Usage: sh tools/run_suite_batches.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."

run () {
  echo "=== batch: $* ==="
  python -m pytest -q -m "not slow" "$@"
}

# 1. data / io / metrics / distribution laws
run tests/test_data.py tests/test_metrics.py tests/test_flac.py \
    tests/test_flac_external.py tests/test_flac_fuzz.py \
    tests/test_converter.py tests/test_stochastic_policies.py \
    tests/test_packaging.py tests/test_preflight_la.py

# 2. parallel / multihost / checkpointing
run tests/test_parallel.py tests/test_multihost.py \
    tests/test_orbax_compat.py tests/test_grad_accum.py

# 3. models / eval / serving
run tests/test_aasist_parity.py tests/test_aasist2.py \
    tests/test_baseline_models.py tests/test_layers.py \
    tests/test_eval_pipeline.py tests/test_eval_variants.py \
    tests/test_serving.py tests/test_fused_frontend.py \
    tests/test_long_audio.py tests/test_dcs_drift.py

# 4. train stack / robustness / differentials
run tests/test_train_stack.py tests/test_mixed_precision.py \
    tests/test_robust_training.py tests/test_e2e_training.py \
    tests/test_e2e_differential.py tests/test_train_differential.py

echo "=== all non-slow batches passed ==="
