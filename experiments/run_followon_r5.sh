#!/bin/bash
# Round-5 follow-on device chain: waits for the r5b queue (esc_v3 is its
# current item; its remaining tpu-suite/bench items are superseded here),
# then runs the trimmed skew rerun, the AmgRefresh scale bench, and the
# one-shot TPU suite. Progress in /tmp/followon_r5.txt.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

wait_for_tunnel() {
  while true; do
    if timeout -k 10 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "tunnel ok: $(date)" | tee -a /tmp/followon_r5.txt
      return 0
    fi
    echo "tunnel down, retry: $(date)" >> /tmp/followon_r5.txt
    sleep 180
  done
}

echo "=== follow-on start: $(date)" | tee /tmp/followon_r5.txt

# wait for the running esc_v3 item to finish (the r5b queue controller is
# already stopped; polling only, no pattern kills)
while pgrep -f esc_v3_bench.py >/dev/null 2>&1; do sleep 60; done
sleep 5

echo "--- 1/3 trimmed skew rerun (VERDICT #3)" | tee -a /tmp/followon_r5.txt
wait_for_tunnel
timeout -k 30 3600 python experiments/skew_dispatch_r5b.py > experiments/skew_dispatch_r5b.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/followon_r5.txt

echo "--- 2/3 AmgRefresh scale bench (VERDICT #2)" | tee -a /tmp/followon_r5.txt
wait_for_tunnel
timeout -k 30 7200 python experiments/amg_refresh_bench.py > experiments/amg_refresh_bench_r5b.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/followon_r5.txt

echo "--- 3/3 one-shot TPU hardware suite" | tee -a /tmp/followon_r5.txt
wait_for_tunnel
SPMX_TPU_TESTS=1 timeout -k 30 10800 python -m pytest tests/test_tpu_kernels.py -v \
  > experiments/tpu_tests_r10.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/followon_r5.txt
echo "=== follow-on done: $(date)" | tee -a /tmp/followon_r5.txt
