#!/usr/bin/env bash
# Orchestrate the full benchmark suite (reference: benchmark/run_all_benchmarks.sh).
# Results land as JSON files under ${RESULTS_DIR:-bench_results}/.
#
#   ./run_all_benchmarks.sh                  # default stencil set
#   MATRICES="a.mtx b.mtx" ./run_all_benchmarks.sh   # SuiteSparse-style files
set -euo pipefail

RESULTS_DIR="${RESULTS_DIR:-bench_results}"
STENCILS="${STENCILS:---stencil 5pt:256 --stencil 9pt:180 --stencil tri:65536}"
REPS="${REPS:-20}"
mkdir -p "$RESULTS_DIR"

MATRIX_ARGS=""
for m in ${MATRICES:-}; do MATRIX_ARGS="$MATRIX_ARGS --matrix $m"; done
INPUTS="$STENCILS $MATRIX_ARGS"

run() {
  name=$1; shift
  echo "== $name =="
  python -m "ginkgo_tpu.benchmark.$name" "$@" --json "$RESULTS_DIR/$name.json" \
    || echo "  $name failed (continuing)"
}

run spmv $INPUTS --repetitions "$REPS" --formats csr,coo,ell,sellp,hybrid,dia,bell
run solver $INPUTS --solvers cg,bicgstab,gmres --preconditioners none,jacobi,block_jacobi
run blas --size 4194304 --repetitions "$REPS"
run sparse_blas $INPUTS
run conversions $INPUTS
run preconditioner $INPUTS --preconditioners jacobi,block_jacobi,ilu,isai
run distributed --mode weak --base-side 64 --trials 2

echo "results in $RESULTS_DIR/"
python - <<'EOF'
import glob, json, os
d = os.environ.get("RESULTS_DIR", "bench_results")
for f in sorted(glob.glob(f"{d}/*.json")):
    rows = json.load(open(f))
    errs = sum(1 for r in rows if "error" in r)
    print(f"{os.path.basename(f)}: {len(rows)} rows, {errs} errors")
EOF
