"""Re-fit the stripe cost-model constants on the round-5 measured grids
(VERDICT r4 #3: 're-fit the cost model on the shipped kernel if it
drifted').

Inputs: experiments/skew_dispatch_r5.out (pass a: full randlocal scan grid
+ select L=2) and skew_dispatch_r5b.out (pass b: claimed winners). Plan
stats (slabs, kw_g, spill frac) are recomputed on CPU — plans are
deterministic. Fits, by least squares on per-slab ns:

  scan:   t/slabs = c0 + ck*KW + cl*L
  select: t = slabs*(s0 + sk*kw_g + sl*L) + frac*nnz*sp_ns

Prints the fitted constants and per-point residuals; apply by editing
utils/autotune.py _DEFAULTS (with this record cited).

Run: PYTHONPATH=/root/repo:/root/.axon_site python \
  experiments/fit_stripe_consts.py > experiments/fit_stripe_consts.out 2>&1
"""
import re

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")


def parse(paths):
    scan, select = [], []
    for path in paths:
        try:
            txt = open(path).read()
        except OSError:
            continue
        # pass a: "<name> stripe scan L=2 KW=4: 303.1 us (model ...)"
        for m in re.finditer(
                r"(\w+)_262k stripe (scan|select) L=(\d+) KW=(\d+): "
                r"([\d.]+) us", txt):
            name, mode, L, KW, us = m.groups()
            (scan if mode == "scan" else select).append(
                (name, int(L), int(KW), float(us)))
        # pass b: "<name>-scan8,16: 890.1 us -> ..." / "<name>-select4,8: ..."
        for m in re.finditer(
                r"(\w+)_262k-(scan|select)(\d+),(\d+): ([\d.]+) us", txt):
            name, mode, L, KW, us = m.groups()
            (scan if mode == "scan" else select).append(
                (name, int(L), int(KW), float(us)))
        # pass b auto rows: "<name>-auto-None: 862.0 us" need cfg from the
        # plan line above it — skipped here (forced-grid rows suffice)
    return scan, select


def main():
    from sparse_matrix_tpu.bench.corpus import _power_law_rows, _random_local
    from sparse_matrix_tpu.formats.stripe import (
        _select_spill_stats, _stripe_counts, plan_stripe)

    rng = np.random.default_rng(0)
    mats = {
        "randlocal": _random_local(rng, 1 << 18, 16, 4096),
        "powerlaw": _power_law_rows(rng, 1 << 18, 16),
    }
    scan, select = parse(["experiments/skew_dispatch_r5.out",
                          "experiments/skew_dispatch_r5b.out"])
    print(f"parsed {len(scan)} scan + {len(select)} select points")

    # scan fit: per-slab ns = c0 + ck*KW + cl*L
    A, y = [], []
    for name, L, KW, us in scan:
        m = mats[name]
        slabs, _ = _stripe_counts(m, L, KW, 128)
        A.append([1.0, KW, L])
        y.append(us * 1e3 / slabs)
    A, y = np.array(A), np.array(y)
    c, *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"scan fit: c0={c[0]:.2f} ck={c[1]:.2f} cl={c[2]:.2f}")
    for (name, L, KW, us), pred in zip(scan, (A @ c)):
        slabs, _ = _stripe_counts(mats[name], L, KW, 128)
        print(f"  {name} scan({L},{KW}): meas {us:.0f} us "
              f"model {pred*slabs/1e3:.0f} us")

    # select fit: t - spill_scan_model = slabs*(s0 + sk*kw_g + sl*L)
    # (the spill term is priced by the scan model on the spilled subset's
    # slab structure — see _select_spill_stats; stats run on a <=300k
    # sample, so the per-sample spill ns scales by nnz/sample_nnz)
    from sparse_matrix_tpu.formats.csr import sample_row_bands

    A, y, meta = [], [], []
    for name, L, KW, us in select:
        m = mats[name]
        slabs, _ = _stripe_counts(m, L, KW, 127)
        frac, kw_g, spill_ns = _select_spill_stats(m, L, KW)
        _sub, scale = sample_row_bands(m, target_nnz=300_000)
        spill_full = spill_ns * scale
        # cross-check against the real plan's kw_g
        p = plan_stripe(m, levels=L, kw=KW, mode="select")
        spn = p.spill.nnz if p.spill is not None else 0
        print(f"  {name} select({L},{KW}): stats kw_g={kw_g} "
              f"frac={frac:.3f} spill_model={spill_full/1e3:.0f} us; "
              f"plan kw_g={p.kw} frac={spn/max(m.nnz(),1):.3f} "
              f"spill_slabs={p.spill.num_slabs if p.spill else 0}")
        A.append([slabs, slabs * kw_g, slabs * L])
        y.append(us * 1e3 - spill_full)
        meta.append((name, L, KW, us, slabs, spill_full))
    if len(A) >= 3:
        A, y = np.array(A), np.array(y)
        s, *_ = np.linalg.lstsq(A, y, rcond=None)
        print(f"select fit: s0={s[0]:.2f} sk={s[1]:.2f} sl={s[2]:.2f}")
        for (name, L, KW, us, slabs, spf), pred in zip(meta, (A @ s)):
            print(f"  {name} select({L},{KW}): meas {us:.0f} us "
                  f"fit {(pred+spf)/1e3:.0f} us")
    else:
        print("too few select points for a 3-param fit")


if __name__ == "__main__":
    main()
