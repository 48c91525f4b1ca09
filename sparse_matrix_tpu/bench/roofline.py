"""Roofline accounting for sparse kernels on TPU."""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["V5E", "TpuSpec", "spmv_ideal_bytes", "spgemm_flops", "roofline_pct"]


@dataclass(frozen=True)
class TpuSpec:
    name: str
    hbm_gbps: float
    bf16_tflops: float
    f32_tflops: float


V5E = TpuSpec(name="v5e", hbm_gbps=820.0, bf16_tflops=197.0, f32_tflops=49.0)


def spmv_ideal_bytes(nnz: int, rows: int, cols: int, *, val_bytes: int = 4, idx_bytes: int = 4) -> int:
    """Ideal CSR working set: vals + column indices once, x and y once."""
    return nnz * (val_bytes + idx_bytes) + (rows + cols) * val_bytes


def spgemm_flops(intermediate_products: int) -> int:
    """2 flops (mul + add) per intermediate product."""
    return 2 * intermediate_products


def roofline_pct(achieved_gbps: float, spec: TpuSpec = V5E) -> float:
    return 100.0 * achieved_gbps / spec.hbm_gbps
