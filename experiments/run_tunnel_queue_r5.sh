#!/bin/bash
# Round-5 device-job queue (health-gated; the axon tunnel flaps).
# Artifacts land in experiments/; progress in /tmp/queue_r5.txt.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_for_tunnel() {
  while true; do
    if timeout -k 10 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "tunnel ok: $(date)" | tee -a /tmp/queue_r5.txt
      return 0
    fi
    echo "tunnel down, retry: $(date)" >> /tmp/queue_r5.txt
    sleep 180
  done
}

echo "=== r5 queue start: $(date)" | tee /tmp/queue_r5.txt

echo "--- 1/5 AmgRefresh at scale (VERDICT #2)" | tee -a /tmp/queue_r5.txt
wait_for_tunnel
timeout -k 30 10800 python experiments/amg_refresh_bench.py > experiments/amg_refresh_bench_r5.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_r5.txt

echo "--- 2/5 scatter/skew dispatch gap (VERDICT #3)" | tee -a /tmp/queue_r5.txt
wait_for_tunnel
timeout -k 30 10800 python experiments/skew_dispatch_r5.py > experiments/skew_dispatch_r5.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_r5.txt

echo "--- 3/5 esc_v3 rerun with params threading (VERDICT #5)" | tee -a /tmp/queue_r5.txt
wait_for_tunnel
timeout -k 30 7200 python experiments/esc_v3_bench.py > experiments/esc_v3_r5.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_r5.txt

echo "--- 4/5 one-shot TPU hardware suite" | tee -a /tmp/queue_r5.txt
wait_for_tunnel
SPMX_TPU_TESTS=1 timeout -k 30 10800 python -m pytest tests/test_tpu_kernels.py -v \
  > experiments/tpu_tests_r10.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_r5.txt

echo "--- 5/5 bench.py sanity" | tee -a /tmp/queue_r5.txt
wait_for_tunnel
timeout -k 30 3600 python bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
echo "rc=$? $(date)" | tee -a /tmp/queue_r5.txt
cat /tmp/bench_r5.json
echo "=== r5 queue done: $(date)" | tee -a /tmp/queue_r5.txt
