"""Scatter/skew-class dispatch pinning (VERDICT r4 weak #3).

The round-5 rerun (experiments/skew_dispatch_r5.out, _r5b.out) reproduced
both r4 claims on hardware — randlocal select(4,8) 17.86 Gnnz/s,
powerlaw scan(8,16) 4.71 — and the refit cost model
(fit_stripe_consts.out) routes both classes to the stripe family with
the measured-best powerlaw config. These tests pin that routing so
constant drift or margin changes can't silently re-route the classes
(the r4 regression: powerlaw auto shipped select(8,8) at 3.03 Gnnz/s)."""

import numpy as np
import pytest

from sparse_matrix_tpu.bench.corpus import _power_law_rows, _random_local
from sparse_matrix_tpu.ops.operator import SpmvOperator


@pytest.fixture(scope="module")
def classes():
    rng = np.random.default_rng(0)
    return {
        "randlocal": _random_local(rng, 1 << 18, 16, 4096),
        "powerlaw": _power_law_rows(rng, 1 << 18, 16),
    }


def test_powerlaw_routes_scan_stripe(classes):
    op = SpmvOperator(classes["powerlaw"])
    assert op.format == "stripe"
    mode, lvl, kw = op._stripe_cfg
    # scan mode is the measured winner (select's wide chunk spans measured
    # 3.03 vs scan(8,16)'s 4.71 Gnnz/s); pin the family and the deep-L
    # wide-KW corner, not the exact pair
    assert mode == "scan"
    assert lvl >= 4 and kw >= 8, op._stripe_cfg


def test_randlocal_routes_stripe(classes):
    op = SpmvOperator(classes["randlocal"])
    # scan(2,2) 16.3 and select(4,8) 17.9 measured within the model's
    # ~10% resolution — either is acceptable; aligned (15.4) / ell are
    # regressions
    assert op.format == "stripe"


def test_dispatch_correct(classes):
    import jax.numpy as jnp

    for name, m in classes.items():
        rng = np.random.default_rng(1)
        op = SpmvOperator(m)
        x = jnp.asarray(rng.standard_normal(m.cols).astype(np.float32))
        y = np.asarray(op(x))
        xh = np.asarray(x)
        for i in rng.choice(m.rows, 32, replace=False):
            lo, hi = int(m.offsets[i]), int(m.offsets[i + 1])
            ref = float(m.vals[lo:hi].astype(np.float64)
                        @ xh[m.indices[lo:hi].astype(np.int64)])
            assert abs(float(y[i]) - ref) <= 1e-2 * max(1.0, abs(ref)), (
                name, i)
