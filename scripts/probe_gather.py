"""Microbench: in-kernel dynamic_gather shapes + XLA ELL gather throughput.

Decides the design of the unstructured (ELL) TPU fast path:

  1. Can Mosaic's tpu.dynamic_gather (jnp.take_along_axis in a Pallas
     kernel) gather across the full lane extent of a wide VMEM window
     (W = 256..4096 lanes), or only within 128-lane vregs?
  2. What throughput does the plain XLA ELL gather path reach on TPU
     (X[..., cols] with RCM-sorted indices)?

Measured on v5e (2026-08-20): lane gather works ONLY at W = 128 (one
vreg) and sublane gather only at S = 8 — Mosaic's dynamic_gather is
vreg-local, so a Pallas kernel cannot gather across a banded VMEM
window; and the XLA ELL gather runs at ~6.6 GB/s gathered
(15 Mnode/s for one [C=12, K=9] neighbor stack), which is the origin
of the ~1.8 MQ/s ELL-fallback substep (5-6 such stacks per substep).
The one-hot-matmul alternative (gather as onehot[K*NB, W] @ X_win[W, C]
on the MXU per RCM band-window) arithmetically costs MORE than the XLA
gather at C ~ 10: the MXU column occupancy is C/128 ~ 10%, giving
~0.3 ms per 1024-node block or ~300 ms per substep at 1M nodes.
CONCLUSION: there is no TPU-native intermediate gather tier worth
building between the canvas fast paths and the XLA ELL fallback — the
productive direction is widening what PACKS (multi-block decomposition,
EV side rows, 2:1 hanging-node interfaces: the AMR-adapted mesh runs at
71.6 MQ/s on the canvas path vs 1.8 on ELL), not accelerating gathers.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_gather.py
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe_lane_gather(P=8, W=512, interpret=False):
    """out[p, w] = x[p, idx[p, w]] inside a kernel (gather along lanes)."""

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    x = jnp.arange(P * W, dtype=jnp.float32).reshape(P, W)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, W, size=(P, W)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32),
        interpret=interpret,
    )(x, idx)
    expect = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    ok = np.array_equal(np.asarray(out), expect)
    return ok


def probe_sublane_gather(S=512, L=128, interpret=False):
    """out[s, l] = x[idx[s, l], l] (gather along sublanes)."""

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    x = jnp.arange(S * L, dtype=jnp.float32).reshape(S, L)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, S, size=(S, L)), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
        interpret=interpret,
    )(x, idx)
    expect = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
    return np.array_equal(np.asarray(out), expect)


def bench_xla_ell_gather(n=1 << 20, K=9, C=12, iters=20):
    """HBM-level ELL gather: [C, n] states, [K, n] int32 cols (RCM-local)."""
    rng = np.random.default_rng(0)
    # banded indices (RCM-like locality: |j - i| < 1500):
    base = np.arange(n)[None, :].repeat(K, 0)
    jitter = rng.integers(-1500, 1500, size=(K, n))
    cols = jnp.asarray(np.clip(base + jitter, 0, n - 1), jnp.int32)
    X = jnp.asarray(rng.standard_normal((C, n)), jnp.float32)

    @jax.jit
    def f(X):
        g = X[:, cols]  # [C, K, n]
        return g.sum(axis=1)

    f(X).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(X)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    gathered_gb = n * K * C * 4 / 1e9
    print(
        f"XLA ELL gather: n={n} K={K} C={C}: {dt * 1e3:.2f} ms/iter, "
        f"{gathered_gb / dt:.1f} GB/s gathered, "
        f"{n / dt / 1e6:.1f} Mnode/s",
        flush=True,
    )


def main():
    print("backend:", jax.default_backend(), flush=True)
    interpret = jax.default_backend() != "tpu"
    for W in (128, 256, 512, 1024, 2048):
        try:
            ok = probe_lane_gather(W=W, interpret=interpret)
            print(f"lane gather W={W}: ok={ok}", flush=True)
        except Exception as e:
            print(f"lane gather W={W}: FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)
    for S in (8, 64, 512, 1024):
        try:
            ok = probe_sublane_gather(S=S, interpret=interpret)
            print(f"sublane gather S={S}: ok={ok}", flush=True)
        except Exception as e:
            print(f"sublane gather S={S}: FAIL {type(e).__name__}: {e}"[:300],
                  flush=True)
    if jax.default_backend() == "tpu":
        bench_xla_ell_gather()


if __name__ == "__main__":
    main()
