"""Minimal repro: remote-compile-helper "HTTP 500" on large standalone
Pallas programs (ROUNDLOG r4 open item 2 / VERDICT r4 weak #7).

RESOLVED (round 5, 2026-08-20) — root cause isolated with this ladder:
the "crash with no diagnostics" is an ordinary **compile-time
scoped-VMEM OOM** against Mosaic's default 16 MB limit, which the
remote compile helper surfaces as an opaque `HTTP 500:
tpu_compile_helper subprocess exit code 1`. Running the same cell with
the helper's stderr visible shows the real message:

    Ran out of memory in memory space vmem while allocating on stack
    for ... custom_call_target="tpu_custom_call" ... Scoped allocation
    with size 24.00M and limit 16.00M exceeded scoped vmem limit

A standalone [8, MP] f32 copy kernel allocates input AND output on the
scoped stack (64·MP bytes total), so the cliff sits at MP = 262144
(16 MB exactly fits) — matching the historical "~400k-row" observation
for the library's 64-byte-per-row [MP,16] tables. Why "embedded in a
bigger program" seemed to dodge it: with surrounding XLA ops the
buffer assignment differs and the same shapes compile. The REAL
workaround is explicit:

    pl.pallas_call(..., compiler_params=
        pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024))

which this ladder verifies up to 1M rows (64 MB resident), and which
`ops/cov_fused_pallas.py` now applies above 256k rows.

The ladder: ONE trivial pallas_call (copy a [8, MP] f32 VMEM-resident
block) at MP = 262k..1M, each MP run four ways in fresh subprocesses:

  standalone       — jax.jit(pallas_call), DEFAULT 16 MB scoped limit
  standalone+vmem  — same with vmem_limit_bytes=100MB
  embedded         — pallas_call inside a larger XLA program
  chunked          — two calls at MP/2 under the default limit

Measured matrix (chip, 2026-08-20): standalone ok at 262k (in+out =
16 MB exactly), CRASH at 393k-1M; standalone+vmem ok at EVERY size
through 1M; embedded ok everywhere; chunked ok through 524k and CRASH
at 786k/1M (chunks of 393k/524k are themselves over the cliff) — every
cell exactly where the 16 MB in+out accounting predicts it.

Usage (needs the tunnel TPU; run jobs SERIALLY on this box):
    python tools/repro_compile_helper.py [--max-mp 1048576]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

CELL = r"""
import sys
mp, mode, vmem_mb = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, o_ref):
    # one whole-block read+write; the operand is the trigger, not the math
    o_ref[:] = x_ref[:] * 2.0

def call(x):
    mpx = x.shape[1]
    params = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
              if vmem_mb else None)
    # x64 must be OFF around pallas_call: index maps otherwise trace to
    # i64 which Mosaic rejects ("failed to legalize 'func.return'") —
    # same guard as every library kernel.
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((8, mpx), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, mpx), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, mpx), jnp.float32),
            compiler_params=params,
        )(x)

x = jnp.ones((8, mp), jnp.float32)
if mode == "standalone":
    y = jax.jit(call)(x)
elif mode == "embedded":
    @jax.jit
    def prog(x):
        x = x + jnp.float32(1.0)            # XLA prologue
        y = call(x)
        return jnp.tanh(y[:, :128]).sum()   # XLA epilogue
    y = prog(x)
else:  # chunked
    y = jax.jit(call)(x[:, : mp // 2])
    y2 = jax.jit(call)(x[:, mp // 2 :])
float(jnp.asarray(y).sum() if hasattr(y, "sum") else y)
print("CELL_OK")
"""


def run_cell(mp: int, mode: str, vmem_mb: int, timeout: int = 600):
    try:
        r = subprocess.run(
            [sys.executable, "-c", CELL, str(mp), mode, str(vmem_mb)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    if "CELL_OK" in r.stdout:
        return "ok"
    tail = (r.stderr.strip().splitlines() or ["<no stderr>"])[-1][:160]
    return f"CRASH(exit={r.returncode}: {tail})"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-mp", type=int, default=1_048_576)
    ap.add_argument("--vmem-mb", type=int, default=100,
                    help="scoped-VMEM limit for cells >16MB (0 = default)")
    args = ap.parse_args(argv)

    ladder = [262_144, 393_216, 524_288, 786_432, 1_048_576]
    ladder = [m for m in ladder if m <= args.max_mp]
    results = {}
    for mp in ladder:
        cells = [
            ("standalone", 0),              # default 16 MB scoped limit
            ("standalone+vmem", args.vmem_mb),
            ("embedded", 0),
            ("chunked", 0),
        ]
        for label, vm in cells:
            mode = label.split("+")[0]
            key = f"{mp}:{label}"
            results[key] = run_cell(mp, mode, vm)
            print(f"{mp:>9d} rows  {label:16s} -> {results[key]}", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
