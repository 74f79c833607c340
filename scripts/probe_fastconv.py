"""Probe: can a matmul formulation beat XLA's conv lowering on TPU?

The measured truth (docs/PERFORMANCE.md) is that full-res 3x3 convs at
C=64 run at ~14-17 TF/s bf16 on a v5e whose matmul peak measures ~76 TF/s
— most of the codec's device time is these convs. This probe times the
same 'same'-padded 3x3 conv three ways at codec shapes:

  conv    : lax.conv_general_dilated NHWC/HWIO (what nn.Conv emits)
  taps    : 9 shifted einsums (bhwc,cf->bhwf) accumulated in f32
  im2col  : concat the 9 taps on C then ONE (bhw,9C)@(9C,F) matmul

Measurement per the axon traps: chained scan perturbing the carry, one
scalar fetch at the end; dispatch-pipelining and deferred execution do not
pollute the numbers.

Run:  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache python scripts/probe_fastconv.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(build_fn, x, n=8):
    fn = build_fn()

    @jax.jit
    def run(x):
        def body(c, _):
            y = fn(c)
            # perturb the carry with a reduction of y: every iteration
            # depends on the previous (defeats hoisting); 1e-30 defeats
            # constant folding without changing values materially
            c2 = c + (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(c.dtype)
            return c2, ()

        c, _ = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(c.astype(jnp.float32))

    float(run(x))  # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0) / n
    return dt


def main():
    H, W = 1088, 1920
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    cases = [(64, 64), (32, 32), (64, 128), (96, 64)]
    for cin, cout in cases:
        x = jnp.asarray(rng.standard_normal((1, H, W, cin)), dt)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dt)
        b = jnp.asarray(rng.standard_normal((cout,)) * 0.01, dt)
        gflop = 2 * 9 * cin * cout * H * W / 1e9

        def conv_direct():
            def f(x):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            return f

        def conv_taps():
            def f(x):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                acc = None
                for di in range(3):
                    for dj in range(3):
                        xs = jax.lax.dynamic_slice(
                            xp, (0, di, dj, 0), (1, H, W, cin))
                        t = jnp.einsum(
                            "bhwc,cf->bhwf", xs, w[di, dj],
                            preferred_element_type=jnp.float32)
                        acc = t if acc is None else acc + t
                return acc.astype(x.dtype) + b
            return f

        def conv_im2col():
            wf = w.reshape(9 * cin, cout)

            def f(x):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                taps = [
                    jax.lax.dynamic_slice(xp, (0, di, dj, 0),
                                          (1, H, W, cin))
                    for di in range(3) for dj in range(3)
                ]
                big = jnp.concatenate(taps, axis=-1)
                y = jnp.einsum("bhwc,cf->bhwf", big, wf,
                               preferred_element_type=jnp.float32)
                return y.astype(x.dtype) + b
            return f

        for name, builder in (("conv", conv_direct), ("taps", conv_taps),
                              ("im2col", conv_im2col)):
            try:
                t = timeit(builder, x)
                print(f"{cin:3d}->{cout:3d} {name:7s} {t*1e3:7.2f} ms  "
                      f"{gflop/t/1e3:6.1f} TF/s", flush=True)
            except Exception as e:  # pragma: no cover
                print(f"{cin:3d}->{cout:3d} {name:7s} FAILED {e}",
                      flush=True)

    # matmul reference point at the conv's contraction geometry
    for k in (64, 576):
        a = jnp.asarray(rng.standard_normal((H * W, k)), dt)
        bm = jnp.asarray(rng.standard_normal((k, 64)), dt)

        def mm():
            def f(a):
                return a @ bm
            return f

        t = timeit(mm, a)
        gflop = 2 * H * W * k * 64 / 1e9
        print(f"matmul ({H*W}x{k})@({k}x64): {t*1e3:7.2f} ms "
              f"{gflop/t/1e3:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
