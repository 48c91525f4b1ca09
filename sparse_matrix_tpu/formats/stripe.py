"""Stripe: the multi-level destination format for no-locality SpMV.

The round-2/3 formats (LanePack, Aligned) all hit the same wall on
scattered matrices: a chunk (128 slots sharing one x-window slice) can only
target ONE 128-row block, because run sums are placed at destination lanes
``row % 128`` and lane uniqueness requires all rows of a chunk to live in
one block. Entries per (row block x column window) cell are the fill bound
— ~31/128 on the randlocal_262k corpus case (uniform columns in a +/-4096
band), which is why every round-3 design bottomed at ~16% roofline there
(docs/PERF.md).

Stripe breaks the cell bound on BOTH axes at once:

* a chunk spans ``L`` row blocks (a *stripe* of ``L*128`` rows) while
  sharing one ``KW*128``-column x window. Within a stripe,
  ``(row % 128, (row % (L*128)) // 128)`` = (destination lane, level) is
  UNIQUE per row, so the single lane-axis prefix sum still resolves every
  row's run: ``L`` pairs of host-planned ``ends``/``starts`` boundary
  gathers extract per-level run sums, each landing at its destination lane
  within its own level's row block. ``L=1`` degenerates to the LanePack
  cell structure;
* entries are sorted by ``(stripe, window, row, col)``; a chunk is up to
  128 consecutive slots of one ``(stripe, window)`` group — on randlocal
  at (L=4, KW=4) groups hold ~500 entries, so chunks pack at ~0.85 fill
  vs 0.24 for the single-cell formats; powerlaw's uniform scatter reaches
  ~0.7 at (L=8, KW=16) vs 0.012 aligned;
* a slab (8 chunks) shares one stripe; the kernel stacks the L level sums
  into an ``(L, 128)`` tile and accumulates it into the VMEM-resident y
  with ONE dynamic-index add per slab (alternating buffers break the RMW
  chain, as in the aligned kernel).

HBM stream per slot: 4B value + lane (1B at KW=1, else 2B) + 2L bytes of
ends/starts. The (KW, L) trade is picked by a calibrated per-slab cost
model over the measured slab counts (utils/autotune: stripe_fixed_ns +
stripe_kw_ns*KW + stripe_lvl_ns*L).

New scope vs the reference (no SpMV there); the irregular-axis packing
follows the FLOP-balancing idea of ``rows_to_threads``
(``/root/reference/spam_csr/src/mul_hash.rs:38-64``): fixed work per grid
step regardless of row/column skew.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from .csr import CsrMatrix
from .lanepack import LANES, SUBLANES

__all__ = ["StripePlan", "plan_stripe", "count_stripe_slabs", "stripe_cost"]


@dataclass(frozen=True)
class StripePlan:
    """Host-side plan; numpy arrays, moved to device by the kernel wrapper.

    ``S`` slabs: ``vals`` (S,8,128) dtype; ``lane`` (S,8,128) int8/int16
    (column within the chunk's KW*128-col window); ``ends``/``starts``
    (S,L,8,128) int8 run boundaries per level (starts may be -1; 0/0 =
    empty); ``stripe_rb`` (S,) int32 first destination row block
    (= stripe * L); ``col_off`` (S*8,) int32 x2d window row per chunk;
    ``chunk_stripe`` (S*8,) int32 per-chunk stripe (reference path);
    ``rb_mask`` (r128_padded,) nonzero where the row block has entries.
    """

    rows: int
    cols: int
    levels: int
    kw: int
    vals: np.ndarray
    lane: np.ndarray
    ends: np.ndarray
    starts: np.ndarray
    stripe_rb: np.ndarray
    col_off: np.ndarray
    chunk_stripe: np.ndarray
    rb_mask: np.ndarray
    nnz: int
    dtype: np.dtype

    @property
    def num_slabs(self) -> int:
        return int(self.vals.shape[0])

    @property
    def r128(self) -> int:
        return -(-self.rows // LANES)

    @property
    def r128_padded(self) -> int:
        """Row blocks padded to whole stripes (kernel y allocation)."""
        h = self.levels * LANES
        return -(-self.rows // h) * self.levels

    @property
    def c128(self) -> int:
        return -(-self.cols // LANES)

    @property
    def fill(self) -> float:
        total = self.vals.size
        return self.nnz / total if total else 1.0

    def slot_bytes(self) -> int:
        """Total HBM bytes streamed per SpMV (slab arrays)."""
        return int(
            self.vals.nbytes + self.lane.nbytes + self.ends.nbytes
            + self.starts.nbytes
        )


def count_stripe_slabs(m: CsrMatrix, levels: int, kw: int) -> int:
    """Slab count for a candidate (L, KW) pair (cheap, no packing) — the
    dispatch cost model's input, memoized like lanepack's _count_slabs."""
    memo = m._cache.setdefault("count_stripe_slabs", {})
    hit = memo.get((levels, kw))
    if hit is not None:
        return hit
    h = levels * LANES
    r = m.row_ids()
    w = m.indices.astype(np.int64) // (kw * LANES)
    wtot = m.cols // (kw * LANES) + 2
    keys = np.sort((r // h) * wtot + w)
    if len(keys) == 0:
        memo[(levels, kw)] = 0
        return 0
    head = np.r_[True, keys[1:] != keys[:-1]]
    sizes = np.diff(np.append(np.nonzero(head)[0], len(keys)))
    chunks_per_group = -(-sizes // LANES)
    # chunks regroup per stripe (slabs pad at stripe boundaries)
    grp_stripe = (keys[head] // wtot).astype(np.int64)
    order = np.argsort(grp_stripe, kind="stable")
    cg = chunks_per_group[order]
    gs = grp_stripe[order]
    s_head = np.r_[True, gs[1:] != gs[:-1]]
    per_stripe = np.add.reduceat(cg, np.nonzero(s_head)[0])
    out = int(np.sum(-(-per_stripe // SUBLANES)))
    memo[(levels, kw)] = out
    return out


def _cost_constants() -> Tuple[float, float, float]:
    from ..utils import autotune

    return (
        autotune.get("stripe_fixed_ns"),
        autotune.get("stripe_kw_ns"),
        autotune.get("stripe_lvl_ns"),
    )


def stripe_cost(m: CsrMatrix, levels: int, kw: int) -> float:
    """Estimated apply ns for a candidate (L, KW): slabs * per-slab model."""
    c0, ck, cl = _cost_constants()
    return count_stripe_slabs(m, levels, kw) * (c0 + ck * kw + cl * levels)


def plan_stripe(
    m: CsrMatrix,
    *,
    dtype=np.float32,
    levels: Optional[int] = None,
    kw: Optional[int] = None,
    level_candidates: Sequence[int] = (1, 2, 4, 8),
    kw_candidates: Sequence[int] = (1, 2, 4, 8, 16),
) -> StripePlan:
    """Plan SpMV for ``m``; O(nnz log nnz) host time, vectorized numpy.

    ``levels`` (L) and ``kw`` default to the calibrated cost-model argmin
    over the candidate grid (slab counts are cheap to evaluate; on
    multi-M-nnz inputs the memoized counts dominate plan time far less
    than the fill pass)."""
    rows, cols = m.rows, m.cols
    nnz = m.nnz()

    if levels is None or kw is None:
        mm, mscale = m, 1.0
        if nnz > 1_500_000:
            from .csr import sample_row_bands

            mm, mscale = sample_row_bands(m)
        c0, ck, cl = _cost_constants()
        best, best_cost = (1, 1), float("inf")
        for lc in (level_candidates if levels is None else (levels,)):
            if lc > 1 and (lc // 2) * LANES >= rows + LANES:
                continue
            for kc in (kw_candidates if kw is None else (kw,)):
                if kc > 1 and (kc // 2) * LANES > cols + LANES:
                    continue
                s = count_stripe_slabs(mm, lc, kc) * mscale
                cost = s * (c0 + ck * kc + cl * lc)
                if cost < best_cost:
                    best, best_cost = (lc, kc), cost
        levels, kw = best
    lvl = int(levels)
    kwi = int(kw)
    h = lvl * LANES
    wsz = kwi * LANES

    r = m.row_ids().astype(np.int64)
    c = m.indices.astype(np.int64)
    v = m.vals.astype(dtype)

    stripe = r // h
    w = c // wsz
    lane_dtype = np.int8 if kwi == 1 else np.int16
    lane = (c % wsz).astype(lane_dtype)

    perm = np.lexsort((c, r, w, stripe))
    r, w, lane, v, stripe = r[perm], w[perm], lane[perm], v[perm], stripe[perm]
    wtot = cols // wsz + 2
    gk = stripe * wtot + w

    if nnz:
        new_group = np.empty(nnz, dtype=bool)
        new_group[0] = True
        new_group[1:] = gk[1:] != gk[:-1]
        group_start = np.maximum.accumulate(
            np.where(new_group, np.arange(nnz), 0))
        pos = (np.arange(nnz) - group_start) % LANES
        is_chunk_head = (pos == 0)
        heads = np.nonzero(is_chunk_head)[0]
        head_stripe = stripe[heads]
        head_w = w[heads]
    else:
        pos = np.zeros(0, np.int64)
        is_chunk_head = np.zeros(0, bool)
        heads = np.zeros(0, np.int64)
        head_stripe = np.zeros(0, np.int64)
        head_w = np.zeros(0, np.int64)
    num_chunks = len(heads)

    # pack chunks 8-per-slab within each stripe (slabs never straddle a
    # stripe: the kernel does ONE (L,128) accumulate per slab)
    if num_chunks:
        s_change = np.r_[True, head_stripe[1:] != head_stripe[:-1]]
        chunk_in_stripe = np.arange(num_chunks) - np.maximum.accumulate(
            np.where(s_change, np.arange(num_chunks), 0))
        s_idx = np.nonzero(s_change)[0]
        cnt = np.diff(np.append(s_idx, num_chunks))
        slabs_per = -(-cnt // SUBLANES)
        base = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(slabs_per[:-1], out=base[1:])
        stripe_slab_base = np.repeat(base, cnt)
        chunk_slab = stripe_slab_base + chunk_in_stripe // SUBLANES
        chunk_sub = chunk_in_stripe % SUBLANES
        num_slabs = int(np.sum(slabs_per))
    else:
        chunk_slab = np.zeros(0, np.int64)
        chunk_sub = np.zeros(0, np.int64)
        num_slabs = 0

    vals_s = np.zeros((num_slabs, SUBLANES, LANES), dtype=dtype)
    lane_s = np.zeros((num_slabs, SUBLANES, LANES), dtype=lane_dtype)
    ends_s = np.zeros((num_slabs, lvl, SUBLANES, LANES), dtype=np.int8)
    starts_s = np.zeros((num_slabs, lvl, SUBLANES, LANES), dtype=np.int8)
    col_off = np.zeros(max(num_slabs, 1) * SUBLANES, dtype=np.int32)
    chunk_stripe = np.zeros(max(num_slabs, 1) * SUBLANES, dtype=np.int32)
    stripe_rb = np.zeros(max(num_slabs, 1), dtype=np.int32)

    if nnz:
        ci = chunk_slab * SUBLANES + chunk_sub
        col_off[ci] = (head_w * kwi).astype(np.int32)
        chunk_stripe[ci] = head_stripe.astype(np.int32)
        stripe_rb[chunk_slab] = (head_stripe * lvl).astype(np.int32)

        chunk_id = np.cumsum(is_chunk_head) - 1
        slab_of = chunk_slab[chunk_id]
        sub_of = chunk_sub[chunk_id]
        vals_s[slab_of, sub_of, pos] = v
        lane_s[slab_of, sub_of, pos] = lane

        dst = (r % LANES).astype(np.int64)
        lev = ((r % h) // LANES).astype(np.int64)
        run_head = np.empty(nnz, dtype=bool)
        run_head[0] = True
        run_head[1:] = (r[1:] != r[:-1]) | (chunk_id[1:] != chunk_id[:-1])
        run_tail = np.r_[run_head[1:], True]
        hh = np.nonzero(run_head)[0]
        tt = np.nonzero(run_tail)[0]
        starts_s[slab_of[hh], lev[hh], sub_of[hh], dst[hh]] = (
            pos[hh] - 1).astype(np.int8)
        ends_s[slab_of[tt], lev[tt], sub_of[tt], dst[tt]] = pos[tt].astype(
            np.int8)

    rb_mask = np.zeros(max(-(-rows // h) * lvl, 1), dtype=dtype)
    if nnz:
        rb_used = np.unique(r // LANES)
        rb_mask[rb_used] = 1

    return StripePlan(
        rows=rows,
        cols=cols,
        levels=lvl,
        kw=kwi,
        vals=vals_s,
        lane=lane_s,
        ends=ends_s,
        starts=starts_s,
        stripe_rb=stripe_rb,
        col_off=col_off,
        chunk_stripe=chunk_stripe,
        rb_mask=rb_mask,
        nnz=nnz,
        dtype=np.dtype(dtype),
    )
