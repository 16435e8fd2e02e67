"""Sharded fullsize perf characterization (VERDICT r4 next-#6).

The reference README's headline is the fullsize (~5M voxel, 160x192x160)
compression pipeline (reference README.md:20-21). Round 2 measured the
single-chip batch-1 absolute; MULTICHIP_r04 certified the (2,4)
data x spatial program's CORRECTNESS. This tool characterizes its
PERFORMANCE STRUCTURE on the 8-virtual-CPU mesh, where absolutes are
meaningless but the partitioned program is the real one XLA would run on 8
chips — so per-device FLOPs, collective op counts, and collective BYTES are
exact:

  1. AOT-compile spatial_1200_fullsize over the (2,4) data x spatial mesh
     (global batch 4) and over a single device (batch 1, the anchor shape).
  2. Walk the partitioned HLO for collective traffic per device per step:
     collective-permute = the 3x3x3-conv halo exchanges volume sharding
     induces; all-reduce = gradient/batch-stat psums; all-gather /
     reduce-scatter if GSPMD chose them.
  3. Emit a scaling model anchored to the measured single-chip fullsize
     time T1 (BENCH_DETAILS.json fullsize_train row, or --t1-vps):
     per-device compute ~= T1 * (per-device FLOPs / single-device FLOPs);
     ICI time = bytes / bandwidth (v5e: 2D torus, ~45 GB/s per link per
     direction — jax-ml.github.io/scaling-book); efficiency bounds with
     zero and full compute/comm overlap.

Writes docs/FULLSIZE_SCALING_r05.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DEVICES = 8
# v5e ICI: 2D torus, ~45 GB/s per link per direction (scaling-book "TPUs"
# chapter). A (2,4) mesh maps both axes onto torus rings.
ICI_GBPS = 45.0

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8, "c64": 8, "c128": 16}
_SHAPE_RE = re.compile(r"\b(pred|[sufc]\d+|bf16)\[([\d,]*)\]")


def _shape_bytes(text: str) -> int:
    """Sum bytes of every dtype[dims] shape token in `text`."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def collect_collectives(hlo_text: str) -> dict:
    """Per-category instruction counts + result bytes from partitioned HLO.

    Bytes are the RESULT shapes — for collective-permute that equals the
    bytes each device sends and receives (halo planes); for all-reduce it is
    the reduced buffer size (ring cost ~= 2 * bytes * (n-1)/n per device).
    """
    cats = {"collective-permute": [], "all-reduce": [], "all-gather": [],
            "reduce-scatter": [], "all-to-all": []}
    for line in hlo_text.splitlines():
        s = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.+)$", s)
        if not m:
            continue
        rhs = m.group(1)
        for cat in cats:
            # match the op name at the call site: "<shape> all-reduce(..."
            if re.search(rf"\]\S*\s+{cat}(?:-start)?\(", rhs):
                lhs = rhs.split(f" {cat}", 1)[0]
                cats[cat].append(_shape_bytes(lhs))
                break
    return {
        cat: {"count": len(v), "bytes": int(sum(v)),
              "mb": round(sum(v) / 2**20, 2)}
        for cat, v in cats.items() if v
    }


def compile_fullsize(mesh_shape, global_batch: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.parallel.mesh import make_mesh, replicated
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step

    cfg = dataclasses.replace(get_model_config("spatial_1200_fullsize"),
                              dtype=jnp.bfloat16, remat=False)
    model = make_model(cfg)
    step_fn = make_soft_intro_train_step(
        model, SoftIntroLossConfig(), OptimConfig(), 100, cfg.input_shape,
        remat_calls=True)

    spatial = len(mesh_shape) == 2
    if spatial:
        mesh = make_mesh(mesh_shape, ("data", "spatial"))
        x_sh = NamedSharding(mesh, P("data", "spatial"))
    else:
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
                    help="measured single-chip fullsize batch-1 vol/s "
                         "(default: read BENCH_DETAILS.json)")
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "FULLSIZE_SCALING_r05.json"))
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={N_DEVICES}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("JAX_PLATFORM_NAME", None)

    t1_vps = args.t1_vps
    if t1_vps is None:
        try:
            with open(os.path.join(REPO, "BENCH_DETAILS.json")) as f:
                t1_vps = float(json.load(f)["fullsize_train"]["vps"])
        except Exception:
            t1_vps = None

    print("compiling single-device fullsize batch-1 (FLOP anchor) ...")
    _, flops_1 = compile_fullsize((1,), 1)
    print(f"  counted FLOPs/step: {flops_1 / 1e12:.2f} T")

    print("compiling (2,4) data x spatial fullsize, global batch 4 ...")
    compiled, flops_dev = compile_fullsize((2, 4), 4)
    hlo = compiled.as_text()
    coll = collect_collectives(hlo)
    print(f"  per-device counted FLOPs/step: {flops_dev / 1e12:.2f} T")
    for cat, v in coll.items():
        print(f"  {cat:20s} x{v['count']:<4d} {v['mb']:10.2f} MB")

    # --- scaling model -----------------------------------------------------
    # Per device: batch 2 x depth-1/4 shards of the volume, vs batch-1 full
    # volume on the single chip. T1 anchors seconds/FLOP on real hardware.
    model = {}
    halo_b = coll.get("collective-permute", {}).get("bytes", 0)
    ar_b = coll.get("all-reduce", {}).get("bytes", 0)
    ag_b = (coll.get("all-gather", {}).get("bytes", 0)
            + coll.get("reduce-scatter", {}).get("bytes", 0))
    if t1_vps:
        t1 = 1.0 / t1_vps  # seconds per volume == per step at batch 1
        t_comp = t1 * (flops_dev / flops_1)
        t_halo = halo_b / (ICI_GBPS * 1e9)
        # ring all-reduce over the 2-device data axis: 2*(n-1)/n = 1.0x bytes
        t_ar = ar_b * 1.0 / (ICI_GBPS * 1e9)
        t_ag = ag_b / (ICI_GBPS * 1e9)
        t_comm = t_halo + t_ar + t_ag
        vols_per_step = 4
        model = {
            "anchor_t1_s": round(t1, 3), "anchor_t1_vps": t1_vps,
            "t_compute_per_dev_s": round(t_comp, 4),
            "t_halo_s": round(t_halo, 4), "t_allreduce_s": round(t_ar, 4),
            "t_gather_scatter_s": round(t_ag, 4),
            "comm_share_no_overlap": round(t_comm / (t_comp + t_comm), 4),
            "vps_8chip_no_overlap": round(vols_per_step / (t_comp + t_comm), 3),
            "vps_8chip_full_overlap": round(vols_per_step / max(t_comp, t_comm), 3),
            "vps_8chip_perfect": round(t1_vps * 8, 3),
            "ici_gbps_assumed": ICI_GBPS,
        }
        print("\nscaling model (anchored to measured single-chip "
              f"{t1_vps:.3f} vol/s):")
        for k, v in model.items():
            print(f"  {k:28s} {v}")
    else:
        print("\nno single-chip anchor available (run bench --details or "
              "pass --t1-vps); emitting structure only")

    out = {
        "round": 5,
        "mesh": [2, 4], "axes": ["data", "spatial"], "global_batch": 4,
        "flops_per_step_single_dev_T": round(flops_1 / 1e12, 2),
        "flops_per_step_per_dev_2x4_T": round(flops_dev / 1e12, 2),
        "flop_overhead_vs_perfect_split": round(
            flops_dev / (flops_1 * 4 / N_DEVICES) - 1, 4),
        "collectives_per_dev_per_step": coll,
        "scaling_model": model,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
