"""A/B the fused conv+BN-stat(+input-act) Pallas megakernel against XLA
on the dominant flagship shape bf16[8,80,96,80,64] -> 64 (VERDICT r3
next-#2: measure, don't estimate).

Variants timed (all jitted, scalar-device_get synced — block_until_ready
is unreliable under the remote-attach backend):
  xla_conv        conv alone (XLA, its own conv layout + the bracketing
                  layout copies are inside the jit boundary)
  pallas_conv_v1  kernels/conv3d.py implicit-GEMM (N=Co=64)
  pallas_conv_v2  kernels/conv3d_fused.py matmul (kh in N: K=N=3C=192)
  xla_stage       leaky(x*a+b) -> conv -> BN batch mean/var: the real
                  producer->conv->stat chain a flagship stage runs
  pallas_stage    conv3d_fused_stats(x, w, a, b) + the (B,D)->scalar
                  partial reduce: same math, one kernel + tiny reduce

Usage: python tools/megakernel_ab.py [--batch 8] [--steps 20] [--csv out]
Writes a markdown row per variant; TF/s uses the conv's 2*M*K*N FLOPs
(stage variants include the epilogue in time but not in FLOPs, so their
TF/s is conservative).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sivae_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shape", type=int, nargs=3, default=(80, 96, 80))
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--out", default=None, help="write JSON results here")
    ap.add_argument("--skip", nargs="*", default=(),
                    help="variant names to skip")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpreter mode — CPU smoke test of the "
                         "tool itself, NOT a measurement")
    ap.add_argument("--check", action="store_true",
                    help="before timing, compare pallas vs xla stage "
                         "outputs and grads on the real shape (max |diff|)")
    args = ap.parse_args()

    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from bench import _compile_with_retry
    from sivae_tpu.kernels.conv3d import conv3d_same_pallas
    from sivae_tpu.kernels.conv3d_fused import conv3d_fused_stats

    b = args.batch
    d, h, wd = args.shape
    c = co = args.channels
    dt = jnp.bfloat16

    kx, kw_, ka, kb = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(kx, (b, d, h, wd, c), dt)
    w = (jax.random.normal(kw_, (3, 3, 3, c, co), jnp.float32) * 0.05).astype(dt)
    a = jax.random.uniform(ka, (c,), jnp.float32, 0.8, 1.2)
    bb = jax.random.normal(kb, (c,), jnp.float32) * 0.05

    conv_flops = 2 * b * d * h * wd * (27 * c) * co

    def xla_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def xla_stage(x, w, a, bb):
        g = jax.nn.leaky_relu(
            x.astype(jnp.float32) * a + bb, negative_slope=0.01).astype(x.dtype)
        y = xla_conv(g, w)
        yf = y.astype(jnp.float32)
        n = b * d * h * wd
        mean = jnp.sum(yf, axis=(0, 1, 2, 3)) / n
        var = jnp.sum(yf * yf, axis=(0, 1, 2, 3)) / n - mean * mean
        return y, mean, var

    interp = args.interpret

    def pallas_stage(x, w, a, bb):
        y, psum, psumsq = conv3d_fused_stats(x, w, in_a=a, in_b=bb,
                                             interpret=interp)
        n = b * d * h * wd
        mean = jnp.sum(psum, axis=(0, 1)) / n
        var = jnp.sum(psumsq, axis=(0, 1)) / n - mean * mean
        return y, mean, var

    from sivae_tpu.kernels.conv3d_fused import conv3d_stats

    n_el = b * d * h * wd

    def xla_conv_plain(x, w):
        # no preferred_element_type: its transpose rule rejects mixed
        # bf16/f32 operands under autodiff; matches flax nn.Conv's bf16 path
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def stage_loss_xla(x, w):
        y = xla_conv_plain(x, w)
        yf = y.astype(jnp.float32)
        mean = jnp.sum(yf, axis=(0, 1, 2, 3)) / n_el
        var = jnp.sum(yf * yf, axis=(0, 1, 2, 3)) / n_el - mean * mean
        yn = (yf - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(jax.nn.leaky_relu(yn, 0.01) ** 2)

    def stage_loss_pallas(x, w):
        y, s1, s2 = conv3d_stats(x, w, interp)
        mean = jnp.sum(s1, axis=(0, 1)) / n_el
        var = jnp.sum(s2, axis=(0, 1)) / n_el - mean * mean
        yn = (y.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(jax.nn.leaky_relu(yn, 0.01) ** 2)

    variants = {
        "xla_conv": (lambda: jax.jit(xla_conv).lower(x, w), (x, w)),
        "pallas_conv_v1": (lambda: jax.jit(
            lambda x, w: conv3d_same_pallas(x, w, interp)).lower(x, w),
            (x, w)),
        "pallas_conv_v2": (lambda: jax.jit(
            lambda x, w: conv3d_fused_stats(x, w, interpret=interp)[0]
        ).lower(x, w), (x, w)),
        "xla_stage": (lambda: jax.jit(xla_stage).lower(x, w, a, bb),
                      (x, w, a, bb)),
        "pallas_stage": (lambda: jax.jit(pallas_stage).lower(x, w, a, bb),
                         (x, w, a, bb)),
        # full fwd+bwd through conv -> BN(batch stats) -> act: the
        # integration-decision number (custom VJP: dgrad re-runs the v2
        # kernel, wgrad is XLA's huge-K contraction)
        "xla_stage_grad": (lambda: jax.jit(
            jax.grad(stage_loss_xla, argnums=(0, 1))).lower(x, w), (x, w)),
        "pallas_stage_grad": (lambda: jax.jit(
            jax.grad(stage_loss_pallas, argnums=(0, 1))).lower(x, w),
            (x, w)),
    }

    results = {}
    if args.check:
        # TPU-numerics parity on the real shape (the pytest tier only covers
        # interpret mode on tiny shapes): fwd outputs + both stage grads
        import numpy as np

        ys, mys, vys = jax.jit(xla_stage)(x, w, a, bb)
        yp, myp, vyp = jax.jit(pallas_stage)(x, w, a, bb)
        gx_x, gw_x = jax.jit(jax.grad(stage_loss_xla, argnums=(0, 1)))(x, w)
        gx_p, gw_p = jax.jit(jax.grad(stage_loss_pallas, argnums=(0, 1)))(x, w)

        def md(u, v):
            return float(np.abs(np.asarray(u, np.float32)
                                - np.asarray(v, np.float32)).max())

        checks = {"y": md(ys, yp), "mean": md(mys, myp), "var": md(vys, vyp),
                  "gx": md(gx_x, gx_p), "gw": md(gw_x, gw_p),
                  "gw_scale": float(np.abs(np.asarray(gw_x, np.float32)).max())}
        results["check_maxdiff"] = checks
        print("check max|diff|:", json.dumps(checks), flush=True)
    print("| variant | ms/call | TF/s (conv flops) |")
    print("|---|---|---|")
    for name, (lower, arglist) in variants.items():
        if name in args.skip:
            continue
        try:
            compiled = _compile_with_retry(lower())
            out = compiled(*arglist)
            first = out[0] if isinstance(out, tuple) else out
            float(jax.device_get(first[0, 0, 0, 0, 0]))
            for _ in range(args.warmup - 1):
                out = compiled(*arglist)
            first = out[0] if isinstance(out, tuple) else out
            float(jax.device_get(first[0, 0, 0, 0, 0]))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = compiled(*arglist)
            first = out[0] if isinstance(out, tuple) else out
            float(jax.device_get(first[0, 0, 0, 0, 0]))
            dt_s = (time.perf_counter() - t0) / args.steps
            tfs = conv_flops / dt_s / 1e12
            results[name] = {"ms": round(1000 * dt_s, 2),
                             "tf_s": round(tfs, 1)}
            print(f"| {name} | {results[name]['ms']} | {results[name]['tf_s']} |",
                  flush=True)
        except Exception as e:
            results[name] = {"error": str(e).splitlines()[0][:200]}
            print(f"| {name} | ERROR: {results[name]['error'][:80]} | |",
                  flush=True)

    meta = {"shape": [b, d, h, wd, c], "co": co, "dtype": "bfloat16",
            "conv_flops_T": round(conv_flops / 1e12, 3),
            "steps": args.steps, "results": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(meta, f, indent=2)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
