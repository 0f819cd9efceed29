"""Microbenchmark: pow strategies on TPU inside a Pallas kernel.

Compares jnp.power, exp2(b*log2(x)), and a bit-twiddled fast_pow
(float32 exponent extraction + low-degree polynomials, the TPU analog of
vectorclass's pow_template_d, /root/reference/source/simd.h:176-229).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 512, 1024
REPS = 40  # pow evaluations per element per pass


def fast_log2(x):
    # float32 bit hack: x = 2^e * m, m in [1, 2)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = jnp.float32(bits >> 23) - 127.0
    m = jax.lax.bitcast_convert_type(
        (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000), jnp.float32
    )
    # degree-5 minimax for log2(m) on [1, 2), rel err ~3e-6 abs
    t = m - 1.0
    p = jnp.float32(-0.034436006)
    p = p * t + jnp.float32(0.18216566)
    p = p * t + jnp.float32(-0.46565442)
    p = p * t + jnp.float32(0.71517086)
    p = p * t + jnp.float32(-0.71975631)
    p = p * t + jnp.float32(1.44269504)
    return e + t * p


def fast_exp2(x):
    # 2^x = 2^i * 2^f, i = round(x), f in [-0.5, 0.5]
    i = jnp.round(x)
    f = x - i
    # degree-5 minimax for 2^f on [-0.5, 0.5]
    p = jnp.float32(1.8775767e-3)
    p = p * f + jnp.float32(8.9893397e-3)
    p = p * f + jnp.float32(5.5826318e-2)
    p = p * f + jnp.float32(2.4015361e-1)
    p = p * f + jnp.float32(6.9315308e-1)
    p = p * f + jnp.float32(9.9999994e-1)
    bits = (jnp.int32(i) + 127) << 23
    scale = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return p * scale


def fast_pow(x, b):
    return fast_exp2(b * fast_log2(x))


def make_kernel(powfn, b):
    def kernel(x_ref, o_ref):
        acc = jnp.zeros_like(x_ref[...])
        x = x_ref[...]
        for k in range(REPS):
            acc += powfn(x + jnp.float32(0.01 * k), jnp.float32(b))
        o_ref[...] = acc

    return kernel


def run(name, powfn, b=1.4):
    x = jnp.asarray(np.random.uniform(0.5, 3.0, (H, W)), jnp.float32)
    f = pl.pallas_call(
        make_kernel(powfn, b),
        grid=(H // 64,),
        in_specs=[pl.BlockSpec((64, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((64, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
    )
    f = jax.jit(f)
    y = f(x); y.block_until_ready()
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        y = f(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iter
    per = dt / (H * W * REPS) * 1e12
    print(f"{name:28s} {dt*1e3:8.3f} ms  {per:8.2f} ps/pow")
    return y


if __name__ == "__main__":
    ya = run("jnp.power", jnp.power)
    yb = run("exp2(b*log2)", lambda x, b: jnp.exp2(b * jnp.log2(x)))
    yc = run("fast bit-twiddle", fast_pow)
    run("baseline mult (x*b)", lambda x, b: x * b)
    run("sqrt", lambda x, b: jnp.sqrt(x))
    print("rel err exp2-vs-power:", float(jnp.max(jnp.abs(yb - ya) / ya)))
    print("rel err fast-vs-power:", float(jnp.max(jnp.abs(yc - ya) / ya)))
