#!/bin/bash
# Resume the round-5 TPU battery from step 4 (the first three landed in
# /tmp/tpu_battery_r5 before the driving session died mid-run).
set -u
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_tpu_cache
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
cd /root/repo
OUT=/tmp/tpu_battery_r5
mkdir -p "$OUT"

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  if [ -s "$OUT/$name.done" ]; then echo "skip $name (done)" | tee -a "$OUT/battery.log"; return; fi
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$OUT/battery.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "rc=$rc $name done $(date +%H:%M:%S)" | tee -a "$OUT/battery.log"
  [ $rc -eq 0 ] && echo ok > "$OUT/$name.done"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/battery.log"
}

timeout 90 python -c "import jax; import numpy as np; import jax.numpy as jnp; x=jnp.ones((128,128)); np.asarray((x@x)[:1,:1]); print('tpu ok', jax.devices())" || { echo "probe failed" | tee -a "$OUT/battery.log"; exit 1; }

run wrapper_rtf_e2tts_int8 3000 python benchmarks/wrapper_rtf.py --model E2TTS_Base --dtype int8
run latency_split_e2tts 3000 python benchmarks/wrapper_latency_split.py --model E2TTS_Base --dtype int8
run scan_ab_serve 3600 python benchmarks/scan_compile_bench.py --what serve --iters 3
run bwd_sweep 5400 python benchmarks/train_attn_bwd_sweep.py --n 4096 --b 9 --reps 6
run bwd_sweep2 2400 python benchmarks/train_attn_bwd_sweep.py --n 4096 --b 9 --reps 6 \
  --configs 512,256,256,256 512,256,256,512 512,256,512,256
run train_step_new_bwd 2400 python benchmarks/train_step_bench.py --steps 6
run train_step_decompose_new 3000 python benchmarks/train_step_decompose.py
run wrapper_rtf_mmdit 3600 python benchmarks/wrapper_rtf.py --model F5TTS_v1_MMDiT
run first_chunk 1800 python benchmarks/first_chunk_latency.py
[ -f /tmp/trained_flagship.safetensors ] || \
  run train_flagship 3600 python scripts/convergence_real.py \
    --preset F5TTS_v1_Base --updates 800 \
    --export /tmp/trained_flagship.safetensors
[ -f /tmp/distilled_student12.safetensors ] || \
  run distill_student 3600 python scripts/distill_real.py \
    --teacher-ckpt /tmp/trained_flagship.safetensors
run infill_eval 7200 python -m eraxvif5tts_tpu.eval infill \
  --teacher /tmp/trained_flagship.safetensors \
  --student /tmp/distilled_student12.safetensors \
  --seeds 5 --steps 32 --out-dir benchmarks/artifacts/infill_eval
run scan_ab_train 5400 python benchmarks/scan_compile_bench.py --what train --iters 3 --batch 4
echo "BATTERY COMPLETE $(date)" | tee -a "$OUT/battery.log"
