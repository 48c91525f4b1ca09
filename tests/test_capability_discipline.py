"""Capability-discipline lint: no ambient authority in library modules.

The reference enforces this with a ~170-entry ``disallowed-methods`` list in
``clippy.toml:14-181`` + ``#![deny(clippy::disallowed_method)]`` in every
crate root, forcing cap-std / cap-rand / open-ambient throughout (randomness
is threaded explicitly, e.g. ``spam_csr/src/tests.rs:186-188``).

Python analog: walk every module of ``sparse_matrix_tpu`` with ``ast`` and
assert library code never reaches for ambient authority:

* environment: ``os.environ`` / ``os.getenv`` only inside the documented flag
  surface (``utils/debugflags.py``, ``utils/profiling.py``,
  ``native/loader.py``) — everything else must go through those.
* randomness: no unseeded ``np.random.default_rng()`` and no legacy global
  ``np.random.<fn>`` anywhere; RNGs are constructed from an explicit seed or
  passed in (``CsrMatrix.from_dok_shuffled(dok, rng)``).
* clocks: ``time.*`` only in the bench/fuzz harnesses whose job is timing.
* filesystem: ``open()`` only in modules whose public API takes an explicit
  path (MatrixMarket load/save, native build/loader, operator plan I/O).
"""

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "sparse_matrix_tpu"

# modules allowed to read the environment: the documented runtime-flag surface
ENV_ALLOWED = {
    "utils/debugflags.py",
    "utils/profiling.py",
    "native/loader.py",
}
# dev-tool modules allowed to use wall clocks
CLOCK_ALLOWED = {
    "bench/runner.py",
    "bench/run_corpus.py",
    "bench/roofline.py",
    "verify/fuzz.py",
    "native/build.py",
    "utils/autotune.py",  # calibration microbenchmarks time themselves
    "utils/transfer.py",  # transfer telemetry (benchmarks split host vs push wall)
}
# modules whose API contract is "explicit path in, I/O out"
OPEN_ALLOWED = {
    "core/matrix_market.py",
    "io.py",  # mmread/mmwrite/mminfo take explicit caller-supplied paths
    "native/build.py",
    "native/loader.py",
    "ops/operator.py",
    "utils/profiling.py",
    "utils/autotune.py",  # calibration cache at debugflags.autotune_cache_path()
    "bench/run_corpus.py",
    "verify/fuzz.py",
    "verify/corpus.py",  # FuzzCorpus(path): caller-supplied corpus dir
}


def _dotted(node):
    """Render an attribute/name chain like ``np.random.default_rng`` or ``''``."""
    parts = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
        return ".".join(reversed(parts))
    return ""


def _violations(path: Path, rel: str):
    tree = ast.parse(path.read_text(), filename=str(path))
    out = []
    for node in ast.walk(tree):
        # --- environment access ---
        if isinstance(node, (ast.Attribute, ast.Name)):
            d = _dotted(node)
            if d in ("os.environ", "os.getenv") and rel not in ENV_ALLOWED:
                out.append(f"{rel}:{node.lineno}: ambient env access ({d})")
        if not isinstance(node, ast.Call):
            continue
        d = _dotted(node.func)
        # --- randomness ---
        if d.endswith("random.default_rng") and not node.args and not node.keywords:
            out.append(f"{rel}:{node.lineno}: unseeded default_rng()")
        if d.startswith("np.random.") and d != "np.random.default_rng":
            out.append(f"{rel}:{node.lineno}: legacy global RNG ({d})")
        # --- clocks ---
        if d in ("time.time", "time.perf_counter", "time.monotonic") and rel not in CLOCK_ALLOWED:
            out.append(f"{rel}:{node.lineno}: ambient clock ({d})")
        # --- filesystem ---
        if d == "open" and rel not in OPEN_ALLOWED:
            out.append(f"{rel}:{node.lineno}: ambient open()")
    return out


def test_no_ambient_authority_in_library():
    problems = []
    for path in sorted(PKG.rglob("*.py")):
        rel = path.relative_to(PKG).as_posix()
        problems.extend(_violations(path, rel))
    assert not problems, "\n".join(problems)


def test_allowlists_are_not_stale():
    # every allowlisted module must still exist, so the lists shrink with the code
    for rel in ENV_ALLOWED | CLOCK_ALLOWED | OPEN_ALLOWED:
        assert (PKG / rel).is_file(), f"stale allowlist entry: {rel}"
