"""Generate golden trajectory data by RUNNING the reference trainer itself.

VERDICT r2 weak-#2: the trajectory-parity oracle was an inline torch
transcription of utils/my_trainer.py — a transcription error would be
self-consistent but wrong. This script removes that risk: it imports and
executes the ACTUAL `train_soft_intro_vae` (reference
utils/my_trainer.py:147-508) on CPU and records everything our JAX step
must reproduce:

- per-step train lossE/lossD and val lossE/lossD (>=5 steps),
- the He-initialized starting weights (produced by the trainer's own
  seed-77 + init_weights_he path, my_trainer.py:160-174, 202),
- the final model state_dict (params + BatchNorm running stats),
- both Adam optimizers' exp_avg / exp_avg_sq moments (captured by
  monkeypatching torch.optim.Adam — the reference never exposes them).

Setup constraints that come from the reference code itself:
- input must be 80x96x80: the trainer hardcodes noise (b,1,10,12,10)
  (my_trainer.py:238) => 3 stride-2 stages; tiny channels keep CPU cost low.
- loaders must yield batch 8: save_image indexes panels 0..7
  (my_trainer.py:92-127).
- single-batch loaders + epochs=N give per-step losses; the reference
  never resets train_lossE/val_lossE across epochs (my_trainer.py:205 — a
  real accumulation bug), so per-step values are successive differences of
  the returned lists.
- stochasticity zeroed: torch.randn/randn_like return zeros (noise=0,
  reparameterize eps=0 => z=mu), dropout p=0. The trainer's own seeding
  still drives the He init, which we snapshot by replaying the identical
  seed-77 + apply(init_weights_he) sequence before calling it.

Output: tests/golden/reference_oracle.npz (+ .json metadata). Inputs are
regenerated deterministically by the consuming test (same numpy seed), so
only a checksum is stored.

Usage: python tools/gen_reference_golden.py  (~10-20 min single-core CPU)

Family mode: `--family fc` drives the ACTUAL utils/trainer_fc.py:
train_soft_intro_vae (the FC-latent trainer, reference trainer_fc.py:129)
on a tiny models/mymodel.py SoftIntroVAE instead — vector noise
randn(b, z_ch) (trainer_fc.py:218), same two-phase scheme. Writes
reference_oracle_fc*.npz. The input stays 80x96x80 (the fc head
Linear(forth_ch*5*6*5, 2*z_ch), mymodel.py:125, hardcodes it).

Sensitivity mode: `--perturb 1e-7` multiplies every He-initialized weight
by (1 + eps*u), u~U(-1,1), before training and writes
reference_oracle_perturbed.npz instead. Comparing the perturbed run's
final state/moments against the unperturbed golden measures the reference
trainer's OWN chaotic amplification of fp-level noise over the 5 steps —
the tolerance floor below which cross-framework divergence carries no
parity signal (torch-vs-XLA conv summation order differs at ~1e-7
relative, exactly the modeled perturbation). The oracle test adds
3x this measured per-leaf divergence to its tolerance when the file is
present (tests/test_reference_oracle.py:_chaos_floor).
"""

from __future__ import annotations

import copy
import hashlib
import json
import os
import random
import sys
import tempfile
import types

os.environ.setdefault("MPLBACKEND", "Agg")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# Reference model/run config (tiny channels, flagship topology)
IN_CH = 2
BLOCK_SETTING = [[2, 1, 2], [2, 1, 2], [2, 2, 2]]
INPUT_SHAPE = (80, 96, 80)
BATCH = 8
STEPS = 5
BETA_REC, BETA_NEG, BETA_KL = 1.0, 1024.0, 0.75
DATA_SEED = 123
NOISE_SEED = 2025  # --fixed-noise: seed for the deterministic noise batch

# --family fc: the FC-latent family (models/mymodel.py driven by
# utils/trainer_fc.py). The input must still be 80x96x80 — the fc head is
# Linear(forth_ch*5*6*5, 2*z_ch) (mymodel.py:125) — so only the channel
# counts shrink.
FC_CHANNELS = (2, 2, 2, 2)  # first..forth
FC_Z_CH = 8

# --family dp: main_DataParallel.py's trainer + ITS OWN embedded model
# classes (the plain-ReLU / no-dropout / identity-shortcut family — NOT
# models/models.py's LeakyReLU+dropout family). The flagship DP config is
# SoftIntroVAE(12, [[12,1,2],[24,1,2],[32,2,2],[48,2,2]]) (:605), 4 stride-2
# stages => latent (5,6,5); the trainer hardcodes noise (b,1,5,6,5) (:444)
# so the input must be 80x96x80 and the block_setting must keep 4 stages.
DP_IN_CH = 2
DP_BLOCKS = [[2, 1, 2], [2, 1, 2], [2, 2, 2], [2, 2, 2]]
DP_BETAS = dict(beta_rec=1.0, beta_neg=256.0, beta_kl=1.0)  # :613-616


def _stub_module(name: str, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_reference_import_stubs():
    """Deps of utils/my_trainer.py absent from this image (skorch,
    tune_sklearn) or removed from python 3.12 (asyncore). All are dead
    imports in the reference (VERDICT/SURVEY: never used)."""

    class _Unused:  # pragma: no cover - never instantiated
        pass

    if "skorch" not in sys.modules:
        sk = _stub_module("skorch", NeuralNetClassifier=_Unused)
        sk.callbacks = _stub_module(
            "skorch.callbacks", Callback=_Unused, Checkpoint=_Unused,
            EarlyStopping=_Unused)
        sk.dataset = _stub_module("skorch.dataset", CVSplit=_Unused)
    if "tune_sklearn" not in sys.modules:
        _stub_module("tune_sklearn", TuneSearchCV=_Unused,
                     TuneGridSearchCV=_Unused)
    if "asyncore" not in sys.modules:
        _stub_module("asyncore", loop=_Unused)
    if "skimage" not in sys.modules:
        # only used to annotate save_image JPEG panels (my_trainer.py:109-112)
        # — no effect on training math
        import numpy as _np

        sk = _stub_module("skimage")
        sk.metrics = _stub_module(
            "skimage.metrics",
            mean_squared_error=lambda a, b: float(_np.mean((_np.asarray(a) - _np.asarray(b)) ** 2)),
            structural_similarity=lambda a, b, **kw: 0.0)


def make_inputs():
    import numpy as np

    rng = np.random.RandomState(DATA_SEED)
    x_train = rng.rand(BATCH, 1, *INPUT_SHAPE).astype(np.float32)
    x_val = rng.rand(BATCH, 1, *INPUT_SHAPE).astype(np.float32)
    return x_train, x_val


def adam_moments(opt, module):
    """exp_avg/exp_avg_sq for every named param of `module`, zeros for
    params that never received gradients (no Adam state)."""
    import numpy as np

    out = {}
    names = [n for n, _ in module.named_parameters()]
    params = opt.param_groups[0]["params"]
    assert len(names) == len(params)
    for name, p in zip(names, params):
        st = opt.state.get(p, {})
        if "exp_avg" not in st:
            out[f"{name}.exp_avg"] = np.zeros(tuple(p.shape), np.float32)
            out[f"{name}.exp_avg_sq"] = np.zeros(tuple(p.shape), np.float32)
            continue
        out[f"{name}.exp_avg"] = st["exp_avg"].numpy()
        out[f"{name}.exp_avg_sq"] = st["exp_avg_sq"].numpy()
        out[f"{name}.step"] = np.asarray(float(st["step"]))
    return out


def _extract_dp_namespace(batch_size: int):
    """AST-extract and EXECUTE main_DataParallel.py's own defs.

    The module top-level calls load_data() on the real dataset tree, so it
    cannot be imported; instead the trainer function, its loss helpers and
    its embedded model classes are sliced out by name and exec'd verbatim
    — the executed code IS the reference source, not a transcription.
    """
    import ast
    import time as _time

    import numpy as np
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    import torch.optim as optim
    from torch.utils.data import DataLoader

    with open(os.path.join(REF, "main_DataParallel.py")) as f:
        src = f.read()
    want = {"calc_kl", "reparameterize", "calc_reconstruction_loss",
            "BuildingBlock", "UpsampleBuildingkBlock", "ResNetEncoder",
            "ResNetDecoder", "VAEResNetEncoder", "SoftIntroVAE",
            "train_soft_intro_vae"}
    segs = {}
    for node in ast.parse(src).body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in want:
            segs[node.name] = ast.get_source_segment(src, node)
    missing = want - set(segs)
    assert not missing, f"main_DataParallel.py defs not found: {missing}"

    class _StubOS:  # the trainer only calls os.cpu_count() (DataLoader workers)
        cpu_count = staticmethod(lambda: 0)

    ns = {"torch": torch, "nn": nn, "F": F, "optim": optim, "np": np,
          "random": random, "time": _time, "os": _StubOS,
          "DataLoader": DataLoader,
          # batch_size must exist BEFORE the trainer def executes: it is
          # a default-argument expression (evaluated at def time)
          "batch_size": batch_size}
    order = ["calc_kl", "reparameterize", "calc_reconstruction_loss",
             "BuildingBlock", "UpsampleBuildingkBlock", "ResNetEncoder",
             "ResNetDecoder", "VAEResNetEncoder", "SoftIntroVAE",
             "train_soft_intro_vae"]
    for name in order:
        exec(compile(segs[name], "main_DataParallel.py", "exec"), ns)
    return ns


def run_dp(cli):
    """--family dp: run main_DataParallel.py:train_soft_intro_vae (:384-599)
    on a tiny 4-stage plain-ReLU model and record init/final state, Adam
    moments and the returned val scalars. Its encode/decode go through
    model.module.* (one device), so single-process CPU execution is
    faithful to the reference math. Quirks recorded for the test:
    - the train loop never accumulates train_lossE/train_lossD (:470-505)
      => the returned train scalars are exactly 0.0;
    - val_lossE/val_lossD accumulate across epochs without reset (divided
      by len(val_loader)=1 each epoch) => the returned val scalars are the
      SUM of per-epoch values.
    """
    import numpy as np
    import torch

    steps = cli.steps
    ns = _extract_dp_namespace(BATCH)

    class _FixedDataset(torch.utils.data.Dataset):
        def __init__(self, arr):
            self.x = torch.tensor(arr)

        def __len__(self):
            return len(self.x)

        def __getitem__(self, i):
            return self.x[i], 0

    orig_randn, orig_randn_like = torch.randn, torch.randn_like

    def fixed_randn(*args, **kwargs):
        kwargs.pop("device", None)
        kwargs.pop("dtype", None)
        shape = tuple(kwargs["size"]) if "size" in kwargs else tuple(args)
        vals = np.random.RandomState(NOISE_SEED).randn(*shape)
        return torch.tensor(vals.astype(np.float32))

    # fixed nonzero noise batch (zero noise degenerates the fake path's BN,
    # see --fixed-noise help), zero reparam eps
    torch.randn = fixed_randn
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)
    captured = []
    _Adam = torch.optim.Adam

    class RecordingAdam(_Adam):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            captured.append(self)

    torch.optim.Adam = RecordingAdam
    try:
        random.seed(77)
        np.random.seed(77)
        torch.manual_seed(77)
        # the DP trainer has NO init_weights_he pass — training starts from
        # the torch ctor defaults, which the seed above makes reproducible
        model = ns["SoftIntroVAE"](DP_IN_CH, copy.deepcopy(DP_BLOCKS))
        dp_model = torch.nn.DataParallel(model)  # CPU: forwards self.module
        init_sd = {k: v.detach().clone().numpy()
                   for k, v in model.state_dict().items()}

        x_train, x_val = make_inputs()
        ns["model"] = dp_model
        ns["train_dataset"] = _FixedDataset(x_train)
        ns["val_dataset"] = _FixedDataset(x_val)
        g = torch.Generator()
        g.manual_seed(0)
        ns["g"] = g
        ns["seed_worker"] = lambda wid: None
        out_dir = tempfile.mkdtemp(prefix="ref_oracle_dp_")
        os.makedirs(os.path.join(out_dir, "Parallel"), exist_ok=True)
        ns["log_path"] = out_dir + "/"

        tE, tD, vE, vD = ns["train_soft_intro_vae"](
            lr_e=2e-4, lr_d=2e-4, batch_size=BATCH, start_epoch=0,
            num_epochs=steps, num_vae=0, save_interval=5000,
            recon_loss_type="mse", test_iter=1000, seed=-1,
            device=torch.device("cpu"), **DP_BETAS)
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_randn_like
        torch.optim.Adam = _Adam

    assert tE == 0.0 and tD == 0.0, (
        "expected the DP train-loss no-accumulation quirk", tE, tD)
    final_sd = {k: v.detach().clone().numpy()
                for k, v in model.state_dict().items()}
    assert len(captured) == 2, f"expected 2 Adam instances, got {len(captured)}"
    opt_e, opt_d = captured

    arrays = {"val_lossE": np.asarray([vE]), "val_lossD": np.asarray([vD])}
    for k, v in init_sd.items():
        arrays[f"init/{k}"] = v
    for k, v in final_sd.items():
        arrays[f"final/{k}"] = v
    for k, v in adam_moments(opt_e, model.encoder).items():
        arrays[f"adam_e/{k}"] = v
    for k, v in adam_moments(opt_d, model.decoder).items():
        arrays[f"adam_d/{k}"] = v

    golden_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(golden_dir, exist_ok=True)
    stem = "reference_oracle_dp"
    if steps != STEPS:
        stem += f"_s{steps}"
    npz_path = os.path.join(golden_dir, stem + ".npz")
    np.savez_compressed(npz_path, **arrays)
    meta = {
        "generator": "tools/gen_reference_golden.py --family dp",
        "reference_fn": "main_DataParallel.py:train_soft_intro_vae (:384-599)",
        "torch_version": __import__("torch").__version__,
        "family": "dp", "in_ch": DP_IN_CH, "block_setting": DP_BLOCKS,
        "input_shape": list(INPUT_SHAPE), "batch": BATCH, "steps": steps,
        **DP_BETAS, "scale": "1/(80*96*80)  (:411)",
        "data_seed": DATA_SEED,
        "noise": {"kind": "fixed", "seed": NOISE_SEED,
                  "shape": [BATCH, 1, 5, 6, 5]},
        "train_loss_quirk": "returned train_lossE/train_lossD are 0.0 (the "
                            "loop never accumulates them, :470-505)",
        "val_loss_accumulation": "returned val scalars are sums of "
                                 "per-epoch values (no reset, :520-586)",
        "x_train_sha256": hashlib.sha256(x_train.tobytes()).hexdigest(),
        "x_val_sha256": hashlib.sha256(x_val.tobytes()).hexdigest(),
        "val_lossE": [float(vE)], "val_lossD": [float(vD)],
    }
    with open(os.path.join(golden_dir, stem + ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps({"val_lossE": float(vE), "val_lossD": float(vD),
                      "npz": npz_path}, indent=2))


def main():
    import argparse

    import numpy as np
    import torch

    ap = argparse.ArgumentParser()
    ap.add_argument("--perturb", type=float, default=0.0,
                    help="relative init-weight noise for the sensitivity "
                         "run (writes reference_oracle_perturbed.npz)")
    ap.add_argument("--perturb-tag", default=None,
                    help="suffix for extra sensitivity runs (e.g. '1e-6' "
                         "-> reference_oracle_perturbed_1e-6.npz); default "
                         "keeps the canonical _perturbed.npz the test reads")
    ap.add_argument("--steps", type=int, default=STEPS,
                    help="optimizer steps (= single-batch epochs). steps=1 "
                         "writes reference_oracle_s1.npz/.json: after ONE "
                         "step there is no chaotic amplification, so final "
                         "params/BN stats/Adam moments can be asserted "
                         "tightly (the 5-step fixture needs measured-chaos "
                         "tolerances)")
    ap.add_argument("--family", choices=("spatial", "fc", "dp"), default="spatial",
                    help="spatial: models/models.py + utils/my_trainer.py "
                         "(flagship). fc: models/mymodel.py + "
                         "utils/trainer_fc.py (vector-z family; noise is "
                         "randn(b, z_ch), trainer_fc.py:218). dp: "
                         "main_DataParallel.py's trainer + its embedded "
                         "plain-ReLU model classes (AST-extracted — the "
                         "module top-level needs the real dataset tree)")
    ap.add_argument("--fixed-noise", action="store_true",
                    help="torch.randn (the decoder noise batch) returns a "
                         "FIXED seed-2025 tensor instead of zeros; "
                         "randn_like (reparam eps) stays zero. A zero "
                         "noise batch makes the fake-decode path constant "
                         "per channel: every BN on it sees batch var = 0 "
                         "and gradients through it are fp noise amplified "
                         "by 1/sqrt(bn_eps) per BN layer — framework-"
                         "specific garbage that buries the parity signal "
                         "on decoder-input-side leaves. Fixed nonzero "
                         "noise keeps the path non-degenerate (used by "
                         "the s1 golden)")
    cli = ap.parse_args()
    steps = cli.steps

    if cli.family == "dp":
        run_dp(cli)
        return

    install_reference_import_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if cli.family == "fc":
        import models.mymodel as ref_models  # noqa: E402
        import utils.trainer_fc as mt  # noqa: E402
    else:
        import models.models as ref_models  # noqa: E402
        import utils.my_trainer as mt  # noqa: E402

    # --- zero all stochastic draws (noise batches + reparameterize eps) ---
    orig_randn, orig_randn_like = torch.randn, torch.randn_like

    def zeros_randn(*args, **kwargs):
        kwargs.pop("device", None)
        kwargs.pop("dtype", None)
        if "size" in kwargs:
            return torch.zeros(kwargs["size"])
        return torch.zeros(*args)

    def fixed_randn(*args, **kwargs):
        kwargs.pop("device", None)
        kwargs.pop("dtype", None)
        shape = tuple(kwargs["size"]) if "size" in kwargs else tuple(args)
        # same values on every call (train noise_batch, val viz, val loop
        # all draw the identical (8,1,10,12,10) shape)
        vals = np.random.RandomState(NOISE_SEED).randn(*shape)
        return torch.tensor(vals.astype(np.float32))

    torch.randn = fixed_randn if cli.fixed_noise else zeros_randn
    torch.randn_like = lambda t, **kw: torch.zeros_like(t)

    # --- capture the Adam instances the trainer creates internally ---
    captured = []
    _Adam = torch.optim.Adam

    class RecordingAdam(_Adam):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            captured.append(self)

    torch.optim.Adam = RecordingAdam

    try:
        # Seed BEFORE construction: nn.Conv3d ctors draw their bias init
        # from the global torch RNG, and init_weights_he (my_trainer.py:
        # 511-514) re-inits only conv WEIGHTS — without this, every
        # generator process gets different ctor biases and two golden
        # files are mutually inconsistent (measured: 6 bias leaves, up to
        # 0.75 abs, between the 5-step and first s1 run). Each golden
        # stays self-consistent either way (the init snapshot below is
        # what training actually starts from); seeding here just makes
        # generator runs reproducible.
        random.seed(77)
        np.random.seed(77)
        torch.manual_seed(77)
        if cli.family == "fc":
            model = ref_models.SoftIntroVAE(*FC_CHANNELS, FC_Z_CH)
        else:
            model = ref_models.SoftIntroVAE(IN_CH, copy.deepcopy(BLOCK_SETTING))
        for m in model.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0

        # Replay the trainer's exact seeding+init (my_trainer.py:160-174,
        # 202) so we can snapshot the initial weights; the trainer then
        # repeats the identical deterministic sequence internally.
        random.seed(77)
        np.random.seed(77)
        torch.manual_seed(77)
        model.apply(mt.init_weights_he)
        if cli.perturb:
            prng = np.random.RandomState(2024)
            with torch.no_grad():
                for p in model.parameters():
                    u = torch.tensor(prng.uniform(
                        -1.0, 1.0, tuple(p.shape)).astype(np.float32))
                    p.mul_(1.0 + cli.perturb * u)
        init_sd = {k: v.detach().clone().numpy()
                   for k, v in model.state_dict().items()}

        x_train, x_val = make_inputs()
        labels = torch.zeros(BATCH, dtype=torch.long)
        train_loader = [(torch.tensor(x_train), labels)]
        val_loader = [(torch.tensor(x_val), labels)]

        out_dir = tempfile.mkdtemp(prefix="ref_oracle_")
        for sub in ("imgs", "fakeimgs", "val_imgs", "test1", "prams"):
            os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        path = out_dir + "/"

        tE, tD, vE, vD = mt.train_soft_intro_vae(
            model, train_loader, val_loader, epochs=steps,
            device=torch.device("cpu"), path=path,
            beta_rec=BETA_REC, beta_neg=BETA_NEG, beta_kl=BETA_KL)
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_randn_like
        torch.optim.Adam = _Adam

    # Lists are appended twice per epoch (my_trainer.py:350+492 — known
    # quirk); dedupe, then undo the no-reset accumulation by differencing.
    def per_step(lst):
        acc = np.asarray(lst[::2], dtype=np.float64)
        assert np.allclose(acc, np.asarray(lst[1::2], dtype=np.float64))
        return np.diff(np.concatenate([[0.0], acc]))

    lossE, lossD = per_step(tE), per_step(tD)
    val_lossE, val_lossD = per_step(vE), per_step(vD)
    final_sd = {k: v.detach().clone().numpy()
                for k, v in model.state_dict().items()}

    assert len(captured) == 2, f"expected 2 Adam instances, got {len(captured)}"
    opt_e, opt_d = captured

    def adam_moments(opt, module):
        out = {}
        names = [n for n, _ in module.named_parameters()]
        params = opt.param_groups[0]["params"]
        assert len(names) == len(params)
        for name, p in zip(names, params):
            st = opt.state.get(p, {})
            if "exp_avg" not in st:
                # params that never receive gradients (e.g. the projection
                # shortcuts models.py:28-35 defines but only uses when
                # channel counts differ) have no Adam state: moments are 0
                out[f"{name}.exp_avg"] = np.zeros(tuple(p.shape), np.float32)
                out[f"{name}.exp_avg_sq"] = np.zeros(tuple(p.shape), np.float32)
                continue
            out[f"{name}.exp_avg"] = st["exp_avg"].numpy()
            out[f"{name}.exp_avg_sq"] = st["exp_avg_sq"].numpy()
            out[f"{name}.step"] = np.asarray(float(st["step"]))
        return out

    arrays = {"lossE": lossE, "lossD": lossD,
              "val_lossE": val_lossE, "val_lossD": val_lossD}
    for k, v in init_sd.items():
        arrays[f"init/{k}"] = v
    for k, v in final_sd.items():
        arrays[f"final/{k}"] = v
    for k, v in adam_moments(opt_e, model.encoder).items():
        arrays[f"adam_e/{k}"] = v
    for k, v in adam_moments(opt_d, model.decoder).items():
        arrays[f"adam_d/{k}"] = v

    golden_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(golden_dir, exist_ok=True)
    stem = ("reference_oracle_perturbed" if cli.perturb
            else "reference_oracle")
    if cli.family == "fc":
        stem += "_fc"
    if cli.perturb and cli.perturb_tag:
        stem += f"_{cli.perturb_tag}"
    if steps != STEPS:
        stem += f"_s{steps}"
    npz_path = os.path.join(golden_dir, stem + ".npz")
    np.savez_compressed(npz_path, **arrays)
    if cli.perturb:
        # sensitivity run: only the npz (the canonical meta stays untouched)
        print(json.dumps({"perturb": cli.perturb, "npz": npz_path,
                          "lossE": lossE.tolist()}, indent=2))
        return
    arch = ({"family": "fc", "fc_channels": list(FC_CHANNELS),
             "z_ch": FC_Z_CH} if cli.family == "fc"
            else {"family": "spatial", "in_ch": IN_CH,
                  "block_setting": BLOCK_SETTING})
    meta = {
        "generator": "tools/gen_reference_golden.py",
        "reference_fn": (
            "utils/trainer_fc.py:train_soft_intro_vae" if cli.family == "fc"
            else "utils/my_trainer.py:train_soft_intro_vae"),
        "torch_version": torch.__version__,
        **arch,
        "input_shape": list(INPUT_SHAPE), "batch": BATCH, "steps": steps,
        "beta_rec": BETA_REC, "beta_neg": BETA_NEG, "beta_kl": BETA_KL,
        "data_seed": DATA_SEED,
        "noise": ({"kind": "fixed", "seed": NOISE_SEED} if cli.fixed_noise
                  else {"kind": "zero"}),
        "x_train_sha256": hashlib.sha256(x_train.tobytes()).hexdigest(),
        "x_val_sha256": hashlib.sha256(x_val.tobytes()).hexdigest(),
        "lossE": lossE.tolist(), "lossD": lossD.tolist(),
        "val_lossE": val_lossE.tolist(), "val_lossD": val_lossD.tolist(),
    }
    with open(os.path.join(golden_dir, stem + ".json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps({"lossE": lossE.tolist(), "lossD": lossD.tolist(),
                      "val_lossE": val_lossE.tolist(),
                      "val_lossD": val_lossD.tolist(),
                      "npz": npz_path}, indent=2))


if __name__ == "__main__":
    main()
