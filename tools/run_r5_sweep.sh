#!/bin/bash
# Round-5 measurement sweep — strictly serialized chip jobs (two TPU
# processes sharing the tunnel corrupt each other's timings; NEXT.md
# measurement discipline). Each job logs to /tmp/r5_<tag>.{json,log}.
cd "$(dirname "$0")/.."
set -x
wait_free() {  # never start while another chip job is alive
  while pgrep -f "profile_decode|bench_serving_7b|bench_longctx|bench_chunked_prefill|bench.py" \
        | grep -v $$ > /dev/null; do sleep 20; done
}

wait_free
timeout 2400 python tools/profile_decode.py --bits 4 \
  > /tmp/r5_prof_int4.log 2>&1
wait_free
timeout 3600 python tools/bench_chunked_prefill.py --bits 8 \
  --chunks 0,256,512 --chunk-min 1024 \
  > /tmp/r5_chunked_ab.json 2> /tmp/r5_chunked_ab.log
wait_free
timeout 3000 python tools/bench_serving_7b.py --bits 8 --concurrency 8 \
  --requests 16 --steps 256 --spec-tick 3 \
  > /tmp/r5_int8_spec256.json 2> /tmp/r5_int8_spec256.log
wait_free
timeout 3000 python tools/bench_serving_7b.py --bits 4 --concurrency 1 \
  --requests 6 --steps 256 --batch 1 --temperature 0.0 \
  > /tmp/r5_int4_b1_plain.json 2> /tmp/r5_int4_b1_plain.log
wait_free
timeout 3000 python tools/bench_serving_7b.py --bits 4 --concurrency 1 \
  --requests 6 --steps 256 --batch 1 --spec-tick 3 --temperature 0.0 \
  > /tmp/r5_int4_b1_ngram.json 2> /tmp/r5_int4_b1_ngram.log
wait_free
timeout 3000 python tools/bench_serving_7b.py --bits 4 --concurrency 1 \
  --requests 6 --steps 256 --batch 1 --spec-tick 3 --spec-mode draft \
  --temperature 0.0 \
  > /tmp/r5_int4_b1_draft.json 2> /tmp/r5_int4_b1_draft.log
wait_free
timeout 3000 python tools/bench_serving_7b.py --bits 4 --concurrency 8 \
  --requests 16 --steps 256 --spec-tick 3 --temperature 0.0 \
  > /tmp/r5_int4_b8_ngram.json 2> /tmp/r5_int4_b8_ngram.log
wait_free
timeout 3000 python tools/bench_serving_7b.py --bits 4 --concurrency 8 \
  --requests 16 --steps 256 --spec-tick 3 --spec-mode draft \
  --temperature 0.0 \
  > /tmp/r5_int4_b8_draft.json 2> /tmp/r5_int4_b8_draft.log
wait_free
timeout 3600 python tools/bench_longctx.py --bits 4 --kv int8 \
  --max-len 32768 --positions 1024,8192,16384,32000 \
  > /tmp/r5_longctx32k.json 2> /tmp/r5_longctx32k.log
wait_free
timeout 3600 python bench.py > /tmp/r5_bench_full.json 2> /tmp/r5_bench_full.log
echo SWEEP-DONE
