#!/bin/bash
# Round-4 serving + long-context measurement sweep (VERDICT r3 items 1-2).
# Runs each config sequentially (one chip — no HBM contention) with a
# generous timeout and one retry (the axon tunnel stalls for hours sometimes
# — NEXT.md measurement discipline). One JSON line per config lands in $OUT;
# full logs per config in /tmp/serve_<tag>.log.
#
# Spec configs run at two temperatures: 0.9 bounds the overhead at ~zero
# n-gram acceptance (PRNG-weight text at high temperature never repeats),
# 0.0 (greedy) shows the win where the stream loops and drafts land — real
# checkpoints sit between the two depending on text repetitiveness.
set -u
OUT=${OUT:-tools/results/serving_r04.jsonl}
mkdir -p "$(dirname "$OUT")"
: > "$OUT"
run_cfg() {
  kind=$1; tag=$2; shift 2
  for attempt in 1 2; do
    echo "=== $tag attempt $attempt $(date) ===" >> /tmp/serve_sweep.log
    if timeout 5400 python tools/bench_"$kind".py "$@" \
        > /tmp/serve_"$tag".json 2> /tmp/serve_"$tag".log; then
      python - "$tag" <<'EOF' >> "$OUT"
import json, sys
tag = sys.argv[1]
body = open(f"/tmp/serve_{tag}.json").read()
obj = json.loads(body)
obj["config"] = tag
print(json.dumps(obj))
EOF
      return 0
    fi
    echo "$tag attempt $attempt FAILED rc=$?" >> /tmp/serve_sweep.log
  done
  echo "{\"config\": \"$tag\", \"error\": \"failed twice\"}" >> "$OUT"
}

run_cfg serving_7b int8            --bits 8 --concurrency 8 --requests 32 --steps 64 --port 3419
run_cfg serving_7b int4            --bits 4 --concurrency 8 --requests 32 --steps 64 --port 3421
run_cfg serving_7b int8_spec3      --bits 8 --concurrency 8 --requests 32 --steps 64 --spec-tick 3 --port 3423
run_cfg serving_7b int8_spec3_t0   --bits 8 --concurrency 8 --requests 32 --steps 64 --spec-tick 3 --temperature 0 --port 3425
run_cfg serving_7b int4_spec3_t0   --bits 4 --concurrency 8 --requests 32 --steps 64 --spec-tick 3 --temperature 0 --port 3427
run_cfg longctx    longctx_int8_kv8  --bits 8 --kv int8
run_cfg longctx    longctx_int4_kvbf16 --bits 4 --kv bf16
echo "SWEEP DONE $(date)" >> /tmp/serve_sweep.log
