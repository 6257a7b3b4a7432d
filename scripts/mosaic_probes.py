"""Toolchain-bump probe suite: re-verify every bisected Mosaic crash class
and measured A/B lever (VERDICT r3 item 8 / ROADMAP "re-test each
jax/libtpu bump").

The kernel code carries workarounds calibrated on ONE toolchain (erf
polynomial because Mosaic lacks an erf primitive; slice+concat because
pltpu.roll crashed; folds moved outside kernels because in-kernel reshape
crashed at C=320; fp32 elementwise because PB_EW=1 measured slower; stage
fusion opt-in because it measured 3-8x slower). Each probe isolates one
class in a SUBPROCESS (a Mosaic crash kills the interpreter) and the main
mode prints a keep/flip table: "keep" = the workaround is still needed /
still faster; "FLIP" = the toolchain changed under us and the blocklist
deserves a re-bisect.

  python scripts/mosaic_probes.py            # full table (TPU required)
  python scripts/mosaic_probes.py --probe pltpu_roll   # one, in-process
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CRASH_PROBES = ["erf_prim", "scatter", "pltpu_roll", "reshape_c320"]
PERF_PROBES = ["pb_ew", "pb_s_stage", "pb_train_cpe"]


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() != "tpu":
        print("SKIP: probes exercise the Mosaic TPU compiler", flush=True)
        sys.exit(3)
    return jax


# ------------------------------------------------------------ crash probes
# Each returns normally if the construct compiles+runs; a Mosaic crash
# aborts the subprocess. Shapes mirror where the class was first bisected.

def probe_erf_prim():
    jax = _setup_jax()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[:] = jax.lax.erf(x_ref[:])

    x = jnp.linspace(-3, 3, 256 * 256, dtype=jnp.float32).reshape(256, 256)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
    import numpy as np
    assert np.allclose(np.asarray(out), np.asarray(jax.lax.erf(x)),
                       atol=1e-5)
    print("COMPILED_OK")


def probe_scatter():
    jax = _setup_jax()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.zeros_like(x_ref)
        # in-kernel scatter-add (the class that forced sort-based
        # histograms / gather-only designs)
        o_ref[:] = jnp.zeros_like(x_ref).at[i_ref[:, 0]].add(x_ref[:])

    x = jnp.ones((128, 128), jnp.float32)
    idx = jnp.arange(128, dtype=jnp.int32)[:, None] % 8
    pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(
        x.shape, x.dtype))(x, idx)
    print("COMPILED_OK")


def probe_pltpu_roll():
    jax = _setup_jax()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 56, 0)   # flat-row shift, N=3136

    x = jnp.ones((3136, 64), jnp.float32)
    pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(
        x.shape, x.dtype))(x)
    print("COMPILED_OK")


def probe_reshape_c320():
    jax = _setup_jax()
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        r, n, c = x_ref.shape
        o_ref[:] = x_ref[:].reshape(r * n, c)    # in-kernel fold reshape

    x = jnp.ones((4, 784, 320), jnp.bfloat16)
    pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct(
        (4 * 784, 320), x.dtype))(x)
    print("COMPILED_OK")


# ------------------------------------------------------------- perf probes
# Print "MS <impl_a> <impl_b>"; the parent decides keep/flip by comparing.

def _run_bench(script_args, env_overrides: dict) -> str:
    """Run a kernel microbench in a subprocess with PB_* env (the knobs
    are read at module import time); returns stdout ('' on failure)."""
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_overrides.items()})
    proc = subprocess.run(
        [sys.executable, "-u"] + script_args, cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=1800)
    return proc.stdout if proc.returncode == 0 else ""


def _time_block(env_overrides: dict, stage_idx: int = 3) -> float:
    """Fused inference block ms at a base stage shape (scripts/kbench)."""
    out = _run_bench(["scripts/kbench.py", "--stages", str(stage_idx),
                      "--reps", "30", "--impls", "pallas"], env_overrides)
    ms = []
    for line in out.splitlines():
        if "pallas" in line and " ms" in line:
            toks = line.replace(":", " ").split()
            ms.append(float(toks[toks.index("ms") - 1]))
    return ms[-1] if ms else float("nan")


def _time_train_block(cpe_flag: str, stage_idx: int = 1) -> float:
    """Fused TRAIN block grad ms (scripts/train_kbench); cpe_flag is
    '--cpe' (in-kernel) or '--cpe-ext' (external dwconv, the default)."""
    out = _run_bench(["scripts/train_kbench.py", "--stages",
                      str(stage_idx), "--budgets", "36", "--reps", "20",
                      cpe_flag], {})
    ms = []
    for line in out.splitlines():
        if "budget" in line and "grad" in line:
            toks = line.split()
            ms.append(float(toks[toks.index("grad") + 1]))
    return ms[-1] if ms else float("nan")


def run_crash_probe(name: str) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe", name],
        capture_output=True, text=True, timeout=1800)
    if proc.returncode == 3:
        return "skip (no TPU)"
    if proc.returncode == 0 and "COMPILED_OK" in proc.stdout:
        return "FLIP: construct now compiles — re-bisect the workaround"
    return "keep (still crashes/fails)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default="")
    ap.add_argument("--skip-perf", action="store_true")
    args = ap.parse_args()

    if args.probe:
        globals()[f"probe_{args.probe}"]()
        return

    table = {}
    for name in CRASH_PROBES:
        table[name] = run_crash_probe(name)
        print(f"{name:16s} {table[name]}", flush=True)

    if not args.skip_perf:
        # PB_EW: bf16 elementwise inside kernels (measured net loss r2)
        base = _time_block({"PB_EW": "0"})
        ew = _time_block({"PB_EW": "1"})
        table["pb_ew"] = (
            f"keep fp32 ew ({base:.2f} vs {ew:.2f} ms)" if base <= ew
            else f"FLIP: PB_EW=1 now faster ({ew:.2f} vs {base:.2f} ms)")
        print(f"{'pb_ew':16s} {table['pb_ew']}", flush=True)

        # PB_S_STAGE: whole-stage fusion (measured 3-8x slower r3)
        per_block = _time_block({"PB_S_STAGE": "0"})
        staged = _time_block({"PB_S_STAGE": "1"})
        table["pb_s_stage"] = (
            f"keep per-block ({per_block:.2f} vs {staged:.2f} ms)"
            if per_block <= staged
            else f"FLIP: stage fusion now faster "
                 f"({staged:.2f} vs {per_block:.2f} ms)")
        print(f"{'pb_s_stage':16s} {table['pb_s_stage']}", flush=True)

        # CPE placement in the train backward (in-kernel measured ~6x the
        # external dwconv cost in r3 — ROADMAP "CPE placement matters")
        ext = _time_train_block("--cpe-ext")
        fused = _time_train_block("--cpe")
        table["pb_train_cpe"] = (
            f"keep external ({ext:.2f} vs {fused:.2f} ms)" if ext <= fused
            else f"FLIP: fused CPE now faster ({fused:.2f} vs {ext:.2f} ms)")
        print(f"{'pb_train_cpe':16s} {table['pb_train_cpe']}", flush=True)

    with open("MOSAIC_PROBES.json", "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
