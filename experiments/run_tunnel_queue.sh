#!/bin/bash
# Device-job queue for when the axon tunnel returns (it was down for a
# long stretch of round-3 session 2). Runs each job sequentially and
# records artifacts under experiments/.
set -u
cd /root/repo
echo "=== tunnel queue start: $(date)" | tee /tmp/queue_status.txt

echo "--- 1/4 IC-PCG scale ablation (ilu_pcg_1024)" | tee -a /tmp/queue_status.txt
timeout 3600 python experiments/ilu_pcg_1024.py > experiments/ilu_pcg_1024.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt

echo "--- 2/4 one-shot TPU hardware suite (VERDICT r2 item 5)" | tee -a /tmp/queue_status.txt
SPMX_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_kernels.py -v \
  > experiments/tpu_tests_r5.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt

echo "--- 3/4 corpus r4 (row-skew classes, VERDICT r2 item 7)" | tee -a /tmp/queue_status.txt
timeout 3600 python -m sparse_matrix_tpu.bench.run_corpus --generate --spmv \
  > experiments/corpus_r4.out 2>&1
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt

echo "--- 4/4 bench.py sanity" | tee -a /tmp/queue_status.txt
timeout 2400 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.err
echo "rc=$? $(date)" | tee -a /tmp/queue_status.txt
cat /tmp/bench_r3.json
echo "=== tunnel queue done: $(date)" | tee -a /tmp/queue_status.txt
