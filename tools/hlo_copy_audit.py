"""Audit layout-conversion copies in the compiled flagship step (AOT only).

The round-3 xplane profile shows 19% of the step in `copy` ops — layout
conversions between the default {2,4,3,1,0} (H-in-lanes) and the conv
{4,0,3,2,1} (C-in-lanes, N-in-sublanes) tilings of bf16[8,80,96,80,64]
activations, concentrated around the decoder's hi-res convs. This tool
AOT-compiles model-config variants (no TPU run needed beyond the compile)
and sums copy bytes from the optimized HLO, so layout-affecting changes
can be A/B'd in minutes.

Prints one JSON line per variant: total copy bytes, count, and the top
shapes by bytes.

Usage: python tools/hlo_copy_audit.py [--variant NAME ...] [--batch 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name: model-config overrides (on top of flagship bf16 prod config)
    "prod": {},
    "no_fuse_upconv": {"fuse_upconv": False},
    "save_dec_hi": {"remat_policy": "conv_outs"},
    "conv_outs_lo": {"remat_policy": "conv_outs_lo"},
    "small_ch_pallas": {"use_pallas_small_ch": True},
}

_SHAPE_RE = re.compile(r"copy(?:\.\d+)? = ([a-z0-9]+)\[([0-9,]*)\]")

_BYTES = {"bf16": 2, "f32": 4, "s32": 4, "pred": 1, "u32": 4, "s8": 1,
          "u8": 1, "f16": 2}


def audit(name: str, batch: int):
    import jax
    import jax.numpy as jnp

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step
    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = dataclasses.replace(get_model_config("spatial_1200"),
                              dtype=jnp.bfloat16, **VARIANTS[name])
    model = make_model(cfg)
    x = jnp.zeros((batch,) + cfg.input_shape + (1,), jnp.float32)
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=100)
    step_fn = make_soft_intro_train_step(
        model, SoftIntroLossConfig(), OptimConfig(), 100, cfg.input_shape)
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(state, x).compile()
    hlo = compiled.as_text()

    total = 0
    shapes = Counter()
    count = 0
    for m in _SHAPE_RE.finditer(hlo):
        dt, dims = m.group(1), m.group(2)
        if dt not in _BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        b = n * _BYTES[dt]
        total += b
        count += 1
        shapes[f"{dt}[{dims}]"] += b
    mem = compiled.memory_analysis()
    return {
        "variant": name, "batch": batch,
        "copy_gib": round(total / 2**30, 2),
        "copy_count": count,
        "temp_gb": round(getattr(mem, "temp_size_in_bytes", 0) / 2**30, 2),
        "top_shapes": [
            {"shape": s, "gib": round(b / 2**30, 2)}
            for s, b in shapes.most_common(4)
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variant", action="append", default=None)
    args = ap.parse_args()
    for name in args.variant or list(VARIANTS):
        try:
            res = audit(name, args.batch)
        except Exception as e:
            res = {"variant": name,
                   "error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
