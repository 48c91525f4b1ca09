#!/bin/bash
# Device-job queue with a tunnel-health gate: the axon tunnel flaps (down
# for hours, then up briefly), so each job waits until a cheap
# jax.devices() probe succeeds before starting. Artifacts land in
# experiments/; progress in /tmp/queue_status.txt.
set -u
cd /root/repo

wait_for_tunnel() {
  while true; do
    # -k: a hung axon backend init blocks in C and shrugs off SIGTERM
    if timeout -k 10 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      echo "tunnel ok: $(date)" | tee -a /tmp/queue_status.txt
      return 0
    fi
    echo "tunnel down, retry: $(date)" >> /tmp/queue_status.txt
    sleep 180
  done
}

echo "=== tunnel queue start: $(date)" | tee /tmp/queue_status.txt

echo "--- 1/4 IC-PCG scale ablation (ilu_pcg_1024)" | tee -a /tmp/queue_status.txt
wait_for_tunnel
timeout -k 30 4200 python experiments/ilu_pcg_1024.py > experiments/ilu_pcg_1024.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt

echo "--- 2/4 one-shot TPU hardware suite (VERDICT r2 item 5)" | tee -a /tmp/queue_status.txt
wait_for_tunnel
SPMX_TPU_TESTS=1 timeout -k 30 4200 python -m pytest tests/test_tpu_kernels.py -v \
  > experiments/tpu_tests_r5.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt

echo "--- 3/4 corpus r4 (row-skew classes, VERDICT r2 item 7)" | tee -a /tmp/queue_status.txt
wait_for_tunnel
timeout -k 30 4200 python -m sparse_matrix_tpu.bench.run_corpus --generate --spmv \
  > experiments/corpus_r4.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt

echo "--- 4/4 bench.py sanity" | tee -a /tmp/queue_status.txt
wait_for_tunnel
timeout -k 30 2400 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.err
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt
cat /tmp/bench_r3.json
echo "=== tunnel queue done: $(date)" | tee -a /tmp/queue_status.txt
