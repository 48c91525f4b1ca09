#!/bin/bash
# Round-5 device-job queue, pass b (health-gated; the axon tunnel flaps).
# Reordered: AmgRefresh scale bench runs LAST so plan-time work lands first.
# Artifacts land in experiments/; progress in /tmp/queue_r5b.txt.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_for_tunnel() {
  while true; do
    if timeout -k 10 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "tunnel ok: $(date)" | tee -a /tmp/queue_r5b.txt
      return 0
    fi
    echo "tunnel down, retry: $(date)" >> /tmp/queue_r5b.txt
    sleep 180
  done
}

echo "=== r5b queue start: $(date)" | tee /tmp/queue_r5b.txt

echo "--- 1/4 scatter/skew dispatch gap (VERDICT #3)" | tee -a /tmp/queue_r5b.txt
wait_for_tunnel
timeout -k 30 9000 python experiments/skew_dispatch_r5.py > experiments/skew_dispatch_r5.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_r5b.txt

echo "--- 2/4 esc_v3 rerun with params threading (VERDICT #5)" | tee -a /tmp/queue_r5b.txt
wait_for_tunnel
timeout -k 30 7200 python experiments/esc_v3_bench.py > experiments/esc_v3_r5.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_r5b.txt

echo "--- 3/4 one-shot TPU hardware suite" | tee -a /tmp/queue_r5b.txt
wait_for_tunnel
SPMX_TPU_TESTS=1 timeout -k 30 10800 python -m pytest tests/test_tpu_kernels.py -v \
  > experiments/tpu_tests_r10.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_r5b.txt

echo "--- 4/4 bench.py sanity" | tee -a /tmp/queue_r5b.txt
wait_for_tunnel
timeout -k 30 3600 python bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
echo "rc=$? $(date)" | tee -a /tmp/queue_r5b.txt
cat /tmp/bench_r5.json
echo "=== r5b queue done: $(date)" | tee -a /tmp/queue_r5b.txt
