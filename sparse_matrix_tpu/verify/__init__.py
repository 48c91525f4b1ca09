"""Verification harness: hypothesis strategies (the proptest/arbitrary analog)
and the deep fuzz loop with MatrixMarket failure dumps (the libFuzzer analog,
reference ``fuzz/fuzz_targets/mul_hash.rs``)."""

from . import strategies  # noqa: F401
