#!/bin/bash
# XLA compiler-option sweep on the real chip (run from repo root when the
# axon tunnel is up). Each variant is a fresh compile through the tunnel
# (5-12 min first time; the persistent cache keys on compiler options, so
# repeats are fast). Baseline default scoped-vmem on v5e is 16 MB; the
# pair kernels independently request 64 MB via CompilerParams.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/xla_sweep.jsonl}
: > "$OUT"
run() {
  label="$1"; opts="$2"
  echo "=== $label (BENCH_XLA_OPT=$opts)" >&2
  line=$(BENCH_STEPS=15 BENCH_XLA_OPT="$opts" BENCH_ATTEMPTS=1 \
         timeout 2400 python bench.py 2>/dev/null | tail -1)
  echo "{\"variant\": \"$label\", \"result\": $line}" >> "$OUT"
  echo "$label -> $line" >&2
}
run baseline ""
run vmem32m "xla_tpu_scoped_vmem_limit_kib=32768"
run vmem64m "xla_tpu_scoped_vmem_limit_kib=65536"
cat "$OUT"
