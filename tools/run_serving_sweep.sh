#!/bin/bash
# Round-4 serving measurement sweep (VERDICT r3 item 1). Runs each config
# with a generous timeout and one retry (the axon tunnel stalls for hours
# sometimes — NEXT.md measurement discipline). Results land one JSON line
# per config in $OUT; full logs per config in /tmp/serve_<tag>.log.
set -u
OUT=${OUT:-/tmp/serving_sweep.jsonl}
: > "$OUT"
run_cfg() {
  tag=$1; shift
  for attempt in 1 2; do
    echo "=== $tag attempt $attempt $(date) ===" >> /tmp/serve_sweep.log
    if timeout 5400 python tools/bench_serving_7b.py "$@" \
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

run_cfg int8 --bits 8 --concurrency 8 --requests 24 --steps 64 --port 3419
run_cfg int4 --bits 4 --concurrency 8 --requests 24 --steps 64 --port 3421
echo "SWEEP DONE $(date)" >> /tmp/serve_sweep.log
