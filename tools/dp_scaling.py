"""Pure-DP 8-way scaling characterization for the FLAGSHIP config.

Counterpart to tools/fullsize_scaling.py (which characterized the (2,4)
data x spatial fullsize program): PERF.md's fullsize conclusion is that
pure 8-way DP is the throughput config whenever one chip fits the volume —
this tool puts exact numbers behind that claim for the standard-resolution
flagship (spatial_1200, 80x96x80, per-device batch 8 = the measured bench
operating point).

Same methodology: the 8-virtual-CPU mesh compiles the identical partitioned
GSPMD program XLA would run on 8 chips, so per-device FLOPs and collective
bytes are exact; seconds are anchored to the measured single-chip step
(BENCH_DETAILS.json train row, 5.234 vol/s at batch 8). Under pure DP the
only collective is the gradient/batch-stat all-reduce (BatchNorm stats are
computed over the GLOBAL batch here — a documented improvement over the
reference DataParallel's per-replica stats, COVERAGE.md parity decision #2
— so the BN-stat psums ride the same all-reduce set).

Reference anchor: main_DataParallel.py wraps encoder/decoder in
torch.nn.DataParallel over 2-4 GPUs (scatter/gather through device 0);
here the same scale-out is a NamedSharding(P("data")) on the batch and
XLA-inserted ring all-reduces over ICI.

Writes docs/DP_SCALING_r05.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.fullsize_scaling import ICI_GBPS, N_DEVICES, collect_collectives  # noqa: E402


def compile_flagship(mesh_shape, global_batch: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.parallel.mesh import make_mesh, replicated
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step

    # bench.py's exact operating point: flagship config, bf16 conv compute,
    # default (block-level) remat
    cfg = dataclasses.replace(get_model_config("spatial_1200"),
                              dtype=jnp.bfloat16)
    model = make_model(cfg)
    step_fn = make_soft_intro_train_step(
        model, SoftIntroLossConfig(), OptimConfig(), 100, cfg.input_shape)

    mesh = make_mesh(mesh_shape, ("data",))
    x_sh = NamedSharding(mesh, P("data"))
    x = jax.device_put(
        jnp.zeros((global_batch,) + cfg.input_shape + (1,), jnp.float32), x_sh)
    state = create_train_state(
        model, jax.random.key(0),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=100)
    state = jax.device_put(state, replicated(mesh))
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(state, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return compiled, float(ca.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t1-vps", type=float, default=None,
                    help="measured single-chip flagship batch-8 vol/s "
                         "(default: read BENCH_DETAILS.json)")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "docs", "DP_SCALING_r05.json"))
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEVICES}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("JAX_PLATFORM_NAME", None)

    t1_vps = args.t1_vps
    if t1_vps is None:
        try:
            with open(os.path.join(REPO, "BENCH_DETAILS.json")) as f:
                t1_vps = float(
                    json.load(f)["train_volumes_per_sec_per_chip"])
        except Exception:
            t1_vps = None

    per_dev_batch = 8
    print("compiling single-device flagship batch-8 (FLOP anchor) ...")
    _, flops_1 = compile_flagship((1,), per_dev_batch)
    print(f"  counted FLOPs/step: {flops_1 / 1e12:.2f} T")

    print(f"compiling 8-way DP flagship, global batch "
          f"{per_dev_batch * N_DEVICES} ...")
    compiled, flops_dev = compile_flagship((N_DEVICES,),
                                           per_dev_batch * N_DEVICES)
    hlo = compiled.as_text()
    coll = collect_collectives(hlo)
    print(f"  per-device counted FLOPs/step: {flops_dev / 1e12:.2f} T")
    for cat, v in coll.items():
        print(f"  {cat:20s} x{v['count']:<4d} {v['mb']:10.2f} MB")

    # --- scaling model -------------------------------------------------
    model = {}
    ar_b = coll.get("all-reduce", {}).get("bytes", 0)
    other_b = sum(v["bytes"] for k, v in coll.items() if k != "all-reduce")
    if t1_vps:
        t1 = per_dev_batch / t1_vps  # measured seconds per step at batch 8
        t_comp = t1 * (flops_dev / flops_1)
        # ring all-reduce over the 8-device data axis:
        # 2*(n-1)/n bytes moved per device
        ring = 2 * (N_DEVICES - 1) / N_DEVICES
        t_ar = ar_b * ring / (ICI_GBPS * 1e9)
        t_other = other_b / (ICI_GBPS * 1e9)
        t_comm = t_ar + t_other
        vols_per_step = per_dev_batch * N_DEVICES
        model = {
            "anchor_t1_step_s": round(t1, 4), "anchor_t1_vps": t1_vps,
            "t_compute_per_dev_s": round(t_comp, 4),
            "t_allreduce_s": round(t_ar, 5),
            "t_other_collectives_s": round(t_other, 5),
            "comm_share_no_overlap": round(t_comm / (t_comp + t_comm), 4),
            "vps_8chip_no_overlap": round(
                vols_per_step / (t_comp + t_comm), 3),
            "vps_8chip_full_overlap": round(
                vols_per_step / max(t_comp, t_comm), 3),
            "vps_8chip_perfect": round(t1_vps * 8, 3),
            "ici_gbps_assumed": ICI_GBPS,
        }
        print(f"\nscaling model (anchored to measured single-chip "
              f"{t1_vps:.3f} vol/s):")
        for k, v in model.items():
            print(f"  {k:28s} {v}")
    else:
        print("\nno single-chip anchor (run bench or pass --t1-vps); "
              "emitting structure only")

    out = {
        "round": 5,
        "mesh": [N_DEVICES], "axes": ["data"],
        "global_batch": per_dev_batch * N_DEVICES,
        "per_device_batch": per_dev_batch,
        "flops_per_step_single_dev_T": round(flops_1 / 1e12, 2),
        "flops_per_step_per_dev_dp8_T": round(flops_dev / 1e12, 2),
        "flop_overhead_vs_perfect_split": round(
            flops_dev / flops_1 - 1, 4),
        "collectives_per_dev_per_step": coll,
        "scaling_model": model,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
