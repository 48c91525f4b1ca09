"""Which format should randlocal_262k use? Force each viable format and
time with the chained-jit methodology (VERDICT r2 weak item 5 follow-up:
the corpus's weakest class)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sparse_matrix_tpu.bench.corpus import synthetic_corpus
from sparse_matrix_tpu.bench.runner import bench_device_loop
from sparse_matrix_tpu.ops.operator import SpmvOperator


def main():
    specs = synthetic_corpus()
    a = specs["randlocal_262k.mtx"]()
    print("rows", a.rows, "nnz", a.nnz())
    x0 = np.random.default_rng(0).standard_normal(a.cols).astype(np.float32)
    for force in ["aligned", "lanepack", "bell", "ell", None]:
        try:
            op = SpmvOperator(a, force=force)
        except Exception as e:
            print(f"{force}: plan failed: {e}")
            continue
        fill = None
        for attr in ("_aligned", "_plan", "_bell"):
            p = getattr(op, attr, None)
            if p is not None and hasattr(p, "fill"):
                fill = p.fill
        params = op.as_pytree()
        r = bench_device_loop(
            f"randlocal-{force}", lambda p, v: op.apply(p, v), x0,
            iters=200, params=params)
        st = r.stats()
        gnnz = a.nnz() / r.seconds / 1e9
        print(f"force={force}: format={op.format} fill={fill} "
              f"{r.millis:.4f} ms -> {gnnz:.2f} Gnnz/s "
              f"(med/min {st['median']/st['min']:.3f})", flush=True)


if __name__ == "__main__":
    main()
