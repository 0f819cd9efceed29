"""Microbenchmark: pow(x, gamma) strategies inside a Pallas kernel on TPU.

The limiter's quadratic Newton (equations/euler.py:limiter_limit) spends
~3 pow evaluations per stencil slot per substep; with K=26 slots in 3D
this is the PK3 compute floor (PARITY.md §5).  Candidates:

  a) jnp.power(x, g)              — XLA lowering (exp/log + edge selects)
  b) jnp.exp2(g * jnp.log2(x))    — the reference's fast_pow shape
     (/root/reference/source/simd.h:204 dispatches to a vectorclass
     exp2/log2 polynomial pair for the same reason)
  c) Blinn bit-hack seed + 2 Newton refinements on y^5 = x^7 (gamma=1.4)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pow_tpu.py
"""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


G = 1.4
N = (64, 2048)  # two f32 planes' worth of lanes


def pow_xla(x):
    return jnp.power(x, G)


def pow_exp2(x):
    return jnp.exp2(G * jnp.log2(x))


def pow_newton(x):
    # y = x^1.4 = x * z with z = x^0.4; seed z via the float bit hack
    # (Blinn), refine with Newton on f(z) = z^5 - x^2 (quadratic conv.)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    seed = (0.4 * bits.astype(jnp.float32)
            + (0.6 * 1064866805.0)).astype(jnp.int32)
    z = jax.lax.bitcast_convert_type(seed, jnp.float32)
    x2 = x * x
    for _ in range(2):
        z2 = z * z
        z4 = z2 * z2
        z = z * (0.8 + 0.2 * x2 / (z4 * z))
    return x * z


def make_kernel(powfn, reps=256):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        acc = jnp.zeros_like(x)
        for r in range(reps):
            acc = acc + powfn(x + 1e-3 * r)
        o_ref[...] = acc

    call = lambda v: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct(N, jnp.float32)
    )(v)

    @jax.jit
    def looped(x):
        import jax.lax as lax
        # re-feed the ORIGINAL x each iteration (a tiny carried term
        # keeps the loop sequential without degrading the [0.01, 4]
        # input distribution the timing is supposed to represent)
        return lax.fori_loop(
            0, 64, lambda i, a: call(x + 1e-9 * a), x
        )

    return looped, call


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, N, jnp.float32, 0.01, 4.0)
    for name, fn in [("xla_pow", pow_xla), ("exp2_log2", pow_exp2),
                     ("bithack_newton", pow_newton)]:
        reps = 16
        k, call1 = make_kernel(fn, reps)
        # accuracy measured through the PALLAS kernel (Mosaic codegen),
        # not an XLA re-trace of the same python: one-rep kernel output
        # minus the r-offset series it accumulates.  The 16-term sum can
        # average/cancel per-point errors, so ALSO report the pointwise
        # worst case via a reps=1 kernel against jnp.power directly —
        # that is the quantity that matters for the solver's limiter.
        kref = sum(jnp.power(x + 1e-3 * r, G) for r in range(reps))
        err = float(jnp.max(jnp.abs(call1(x) - kref) / kref))
        _, call_pt = make_kernel(fn, 1)
        ref_pt = jnp.power(x, G)
        err_pt = float(jnp.max(jnp.abs(call_pt(x) - ref_pt) / ref_pt))
        k(x).block_until_ready()
        t0 = time.perf_counter()
        iters = 4
        for _ in range(iters):
            out = k(x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / (iters * 64)
        print(f"{name:16s} rel_err={err:.2e} (summed) "
              f"{err_pt:.2e} (pointwise)  {dt * 1e6:8.1f} us/kernel "
              f"({N[0] * N[1] * reps / dt / 1e9:.2f} Gpow/s)", flush=True)


if __name__ == "__main__":
    main()
