"""Flagship-shape multichip capacity check (VERDICT r2 next-#4).

`__graft_entry__.dryrun_multichip` proves the sharded program compiles and
steps on tiny shapes; this tool AOT-compiles the REAL flagship shapes over
virtual meshes and records compile success + memory_analysis():

  A. spatial_1200, global batch 64, (8,)-mesh pure DP (the v5e-8 flagship,
     per-device batch 8) — reference main_DataParallel.py:609's scaling axis.
  B. spatial_1200_fullsize (~5M voxels), global batch 4, (2,4) data x spatial
     mesh with GSPMD conv halo exchange — the CP-analogue axis (SURVEY §5).
  C. spatial_1200, batch 8, single device — the measured-on-hardware anchor.

Two backends:
  --backend cpu  (default): 8 virtual CPU devices. Validates partitioning/
     collectives and reports XLA:CPU memory analysis. CPU layouts carry no
     TPU tiling/padding, so bytes UNDERESTIMATE TPU HBM; treat as structure
     validation + lower bound.
  --backend tpu : compiles per-device-shaped single-chip programs on the
     real chip (batch 64/8 devices == batch 8 per chip) — the HBM-accurate
     proxy for the DP row (GSPMD adds only gradient psums, whose buffers are
     param-sized: +0.06 GB). Requires the TPU.

Writes MULTICHIP_CAPACITY_r03.json at the repo root.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _setup_platform(backend: str, n_devices: int):
    if backend == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}")
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax  # noqa: F401


def _mem_gb(compiled) -> dict:
    try:
        m = compiled.memory_analysis()
    except Exception as e:  # pragma: no cover
        return {"error": str(e)[:200]}
    out = {}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 3)
    return out


def compile_case(name: str, model_name: str, global_batch: int,
                 mesh_shape, axis_names, spatial: bool, backend: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.parallel.mesh import make_mesh, replicated
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step

    cfg = dataclasses.replace(get_model_config(model_name), dtype=jnp.bfloat16)
    model = make_model(cfg)
    step_kwargs = {}
    if model_name.endswith("fullsize"):
        cfg = dataclasses.replace(cfg, remat=False)
        model = make_model(cfg)
        step_kwargs = dict(remat_calls=True)
    step_fn = make_soft_intro_train_step(
        model, SoftIntroLossConfig(), OptimConfig(), 100, cfg.input_shape,
        **step_kwargs)

    result = {"case": name, "model": model_name, "global_batch": global_batch,
              "mesh": list(mesh_shape), "axes": list(axis_names),
              "backend": backend}
    try:
        if backend == "tpu" and mesh_shape != (1,):
            # per-device-shaped single-chip proxy (see module docstring)
            n = int(np.prod(mesh_shape))
            per_dev_batch = global_batch // mesh_shape[0] if spatial else global_batch // n
            if spatial:
                # hold only this device's DEPTH shard: rebuild the model at
                # the shard shape so every activation matches what one
                # device of the real (data, spatial) program holds (GSPMD
                # halo exchange adds just 2 boundary planes per conv).
                # Full-D was a mesh[1]-x overestimate that "failed" at
                # 19.6 GB while the real shard fits easily.
                d = cfg.input_shape[0] // mesh_shape[1]
                # round DOWN to the model's total stride so the proxy model
                # closes (fullsize has 4 stride-2 stages). Activations scale
                # ~linearly in D, so scale the fit verdict by true_d/d; the
                # ceil-rounded (48) program was big enough that the chipless
                # AOT compile helper was OOM-killed.
                stride = 2 ** sum(1 for b in cfg.block_setting if b[2] == 2)
                true_d = d
                d = max(stride, d // stride * stride)
                result["depth_scale_to_true_shard"] = round(true_d / d, 3)
                cfg = dataclasses.replace(
                    cfg, input_shape=(d,) + tuple(cfg.input_shape[1:]))
                model = make_model(cfg)
                step_fn = make_soft_intro_train_step(
                    model, SoftIntroLossConfig(), OptimConfig(), 100,
                    cfg.input_shape, **step_kwargs)
                result["note"] = (f"single-chip proxy at per-device batch "
                                  f"{per_dev_batch}, depth shard {d} "
                                  "(halo planes excluded: +2 bf16 planes "
                                  "per sharded conv, ~MBs)")
            x = jnp.zeros((per_dev_batch,) + tuple(cfg.input_shape) + (1,),
                          jnp.float32)
            state = create_train_state(
                model, jax.random.key(0),
                jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
                OptimConfig(), steps_per_epoch=100)
            compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(state, x).compile()
            if not spatial:
                result["note"] = (f"single-chip proxy at per-device batch "
                                  f"{per_dev_batch}; DP adds only param-sized "
                                  "psum buffers")
        else:
            mesh = make_mesh(mesh_shape, axis_names)
            x_sh = (NamedSharding(mesh, P(axis_names[0], axis_names[1]))
                    if spatial else NamedSharding(mesh, P(axis_names[0])))
            x = jax.device_put(
                jnp.zeros((global_batch,) + cfg.input_shape + (1,), jnp.float32),
                x_sh)
            state = create_train_state(
                model, jax.random.key(0),
                jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
                OptimConfig(), steps_per_epoch=100)
            state = jax.device_put(state, replicated(mesh))
            compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(state, x).compile()
        result["compiled"] = True
        result.update(_mem_gb(compiled))
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        result["flops_T"] = round(float(ca.get("flops", 0.0)) / 1e12, 1)
    except Exception as e:
        result["compiled"] = False
        result["error"] = f"{type(e).__name__}: {str(e)[:400]}"
    return result


CASES = [
    # name, model, global_batch, mesh_shape, axis_names, spatial?
    ("dp8_flagship_b64", "spatial_1200", 64, (8,), ("data",), False),
    ("dp8_flagship_b128", "spatial_1200", 128, (8,), ("data",), False),
    ("fullsize_2x4_b4", "spatial_1200_fullsize", 4, (2, 4),
     ("data", "spatial"), True),
    ("single_flagship_b8", "spatial_1200", 8, (1,), ("data",), False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=("cpu", "tpu"), default="cpu")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--case", action="append", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    _setup_platform(args.backend, args.devices)
    from sivae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    results = []
    for name, model_name, gb, mesh, axes, spatial in CASES:
        if args.case and name not in args.case:
            continue
        r = compile_case(name, model_name, gb, mesh, axes, spatial, args.backend)
        print(json.dumps(r), flush=True)
        results.append(r)

    out = args.out or os.path.join(REPO, "MULTICHIP_CAPACITY_r03.json")
    existing = []
    if os.path.exists(out):
        with open(out) as f:
            try:
                existing = json.load(f).get("results", [])
            except Exception:
                existing = []
    keyed = {(r["case"], r["backend"]): r for r in existing}
    for r in results:
        keyed[(r["case"], r["backend"])] = r
    with open(out, "w") as f:
        json.dump({
            "note": ("cpu backend = partitioning/collective validation, "
                     "memory is XLA:CPU (no TPU tiling) -> lower bound; "
                     "tpu backend = per-device-shaped single-chip proxy, "
                     "HBM-accurate for the DP rows. v5e HBM = 15.75 GiB "
                     "usable."),
            "results": sorted(keyed.values(),
                              key=lambda r: (r["case"], r["backend"])),
        }, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
