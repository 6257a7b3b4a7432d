"""Profiling / tracing / model summary.

TPU equivalents of the reference's benchmark-time profiling surface
(benchmark.py:320-378,673-717 + main.py:539-564):
  - trace(): jax.profiler context -> TensorBoard-compatible trace dir
  - StepTimer: per-step host timing with device sync
    (replaces time.perf_counter + torch.cuda.synchronize)
  - cost_analysis(): analytic FLOPs/bytes from XLA (replaces
    deepspeed get_model_profile / fvcore FlopCountAnalysis)
  - model_summary(): per-module parameter table (replaces
    torchinfo/torchstat/torchsummary)
  - versions(): runtime version report (replaces the compiling_info op)
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with an honest device sync per window."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        import jax
        if result is not None:
            leaf = jax.tree.leaves(result)[0]
            float(np.asarray(leaf.sum() if hasattr(leaf, "sum") else leaf))
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self) -> float:
        return 1000 * float(np.mean(self.times)) if self.times else 0.0


def cost_analysis(fn: Callable, *args) -> Dict[str, float]:
    """Analytic cost of a jitted function: flops, gmacs, bytes accessed."""
    import jax
    c = jax.jit(fn).lower(*args).compile().cost_analysis() or {}
    out = {"flops": float(c.get("flops", float("nan")))}
    out["gmacs"] = out["flops"] / 2e9
    out["bytes_accessed"] = float(c.get("bytes accessed", float("nan")))
    return out


def model_summary(model, variables, max_depth: int = 2) -> str:
    """Parameter-count table grouped by module path prefix."""
    import jax
    rows: Dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    total = 0
    for path, leaf in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        prefix = "/".join(names[:max_depth])
        n = int(np.prod(leaf.shape))
        rows[prefix] = rows.get(prefix, 0) + n
        total += n
    width = max((len(k) for k in rows), default=10) + 2
    lines = [f"{'module':<{width}}params", "-" * (width + 10)]
    for k in sorted(rows):
        lines.append(f"{k:<{width}}{rows[k]:,}")
    lines.append("-" * (width + 10))
    lines.append(f"{'TOTAL':<{width}}{total:,} ({total / 1e6:.2f} M)")
    return "\n".join(lines)


def versions() -> Dict[str, str]:
    """Runtime versions (replaces the reference's compiling_info native op
    get_compiler_version/get_compiling_cuda_version)."""
    import jax
    import jaxlib
    info = {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "devices": ", ".join(str(d) for d in jax.devices()),
    }
    try:
        from lemevit_tpu.ops import native
        info["leme_ops"] = native.version()
    except Exception:
        pass
    return info
