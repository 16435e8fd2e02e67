"""Numerical parity: reference PyTorch model vs sivae_tpu with imported
weights — the strongest correctness check we can run (SURVEY §7 step 7).

Builds the reference `SoftIntroVAE` (imported from /root/reference, torch
CPU), copies its randomly-initialized state_dict into our flax model via
utils/torch_import, then compares eval-mode encoder and decoder outputs on
the same inputs. Agreement must be near float32-exact since both stacks run
the same ops.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference not mounted")

import dataclasses  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sivae_tpu.config import SpatialVAEConfig  # noqa: E402
from sivae_tpu.models.registry import make_model  # noqa: E402
from sivae_tpu.utils.torch_import import import_spatial_soft_intro_vae  # noqa: E402


def _ref_models():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.models as ref_models

    return ref_models


# small flagship-topology config so the CPU test stays fast
CFG = SpatialVAEConfig(
    in_ch=6,
    block_setting=((6, 1, 2), (10, 1, 2), (12, 2, 2)),
    input_shape=(16, 24, 16),
)


@pytest.fixture(scope="module")
def pair():
    ref_models = _ref_models()
    torch.manual_seed(0)
    tmodel = ref_models.SoftIntroVAE(CFG.in_ch, [list(b) for b in CFG.block_setting])
    tmodel.eval()
    model = make_model(CFG)
    x0 = jnp.zeros((1,) + CFG.input_shape + (1,), jnp.float32)
    variables = model.init(jax.random.key(0), x0)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    imported = import_spatial_soft_intro_vae(sd, CFG, variables)
    return tmodel, model, imported


def test_encoder_parity(pair):
    tmodel, model, variables = pair
    rng = np.random.RandomState(1)
    x = rng.rand(2, *CFG.input_shape).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(torch.tensor(x[:, None]))
    (jmu, jlogvar), _ = model.encode(variables["enc"], jnp.asarray(x[..., None]))
    # torch NCDHW (b,1,d,h,w) vs ours NDHWC (b,d,h,w,1)
    np.testing.assert_allclose(
        tmu.numpy()[:, 0], np.asarray(jmu)[..., 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        tlogvar.numpy()[:, 0], np.asarray(jlogvar)[..., 0], rtol=1e-4, atol=1e-4)


def test_decoder_parity(pair):
    tmodel, model, variables = pair
    rng = np.random.RandomState(2)
    z = rng.randn(2, *CFG.latent_spatial_shape).astype(np.float32)
    with torch.no_grad():
        ty = tmodel.decode(torch.tensor(z[:, None]))
    jy, _ = model.decode(variables["dec"], jnp.asarray(z[..., None]))
    np.testing.assert_allclose(
        ty.numpy()[:, 0], np.asarray(jy)[..., 0], rtol=1e-4, atol=1e-4)


def test_roundtrip_recon_parity(pair):
    tmodel, model, variables = pair
    rng = np.random.RandomState(3)
    x = rng.rand(2, *CFG.input_shape).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(torch.tensor(x[:, None]))
        tz = tmodel.reparameterize(tmu, tlogvar, val_flag=True)  # eps=0.1
        ty = tmodel.decode(tz)
    from sivae_tpu.models.resnet_vae import reparameterize

    (jmu, jlogvar), _ = model.encode(variables["enc"], jnp.asarray(x[..., None]))
    jz = reparameterize(None, jmu, jlogvar, val_eps=0.1)
    jy, _ = model.decode(variables["dec"], jz)
    np.testing.assert_allclose(
        ty.numpy()[:, 0], np.asarray(jy)[..., 0], rtol=1e-4, atol=1e-4)


def test_projection_shortcut_config_parity():
    """Config with stride-1 channel-changing block exercises the 1x1
    projection import path (models.py:28-35)."""
    cfg = SpatialVAEConfig(
        in_ch=4,
        block_setting=((6, 2, 1),),  # first block: 4->6 stride 1 => projection
        input_shape=(8, 8, 8),
    )
    ref_models = _ref_models()
    torch.manual_seed(1)
    tmodel = ref_models.SoftIntroVAE(cfg.in_ch, [list(b) for b in cfg.block_setting])
    tmodel.eval()
    model = make_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    imported = import_spatial_soft_intro_vae(sd, cfg, variables)
    x = np.random.RandomState(5).rand(1, *cfg.input_shape).astype(np.float32)
    with torch.no_grad():
        tmu, _ = tmodel.encode(torch.tensor(x[:, None]))
    (jmu, _), _ = model.encode(imported["enc"], jnp.asarray(x[..., None]))
    np.testing.assert_allclose(
        tmu.numpy()[:, 0], np.asarray(jmu)[..., 0], rtol=1e-4, atol=1e-4)


def test_fc_family_parity():
    """FC-latent (mymodel.py) import + numerical parity, incl. the
    flatten-order permutations on the fc/dfc heads."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.mymodel as ref_mymodel

    from sivae_tpu.config import FCVAEConfig
    from sivae_tpu.utils.torch_import import import_fc_soft_intro_vae

    # the reference hardcodes the 80x96x80 -> (5,6,5) bottleneck
    # (mymodel.py:125 `Linear(forth_ch*5*6*5, ...)`), so parity must run at
    # full input resolution; tiny channel counts keep it fast
    cfg = FCVAEConfig(first_ch=2, second_ch=3, third_ch=4, forth_ch=5, z_ch=7,
                      input_shape=(80, 96, 80))
    torch.manual_seed(3)
    tmodel = ref_mymodel.SoftIntroVAE(2, 3, 4, 5, 7)
    tmodel.eval()
    model = make_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32))
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    imported = import_fc_soft_intro_vae(sd, cfg, variables)

    x = np.random.RandomState(9).rand(2, *cfg.input_shape).astype(np.float32)
    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(torch.tensor(x[:, None]))
        ty = tmodel.decode(tmu)
    (jmu, jlogvar), _ = model.encode(imported["enc"], jnp.asarray(x[..., None]))
    np.testing.assert_allclose(tmu.numpy(), np.asarray(jmu), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(tlogvar.numpy(), np.asarray(jlogvar), rtol=1e-4, atol=1e-4)
    jy, _ = model.decode(imported["dec"], jnp.asarray(tmu.numpy()))
    np.testing.assert_allclose(
        ty.numpy()[:, 0], np.asarray(jy)[..., 0], rtol=1e-4, atol=1e-4)


def test_training_trajectory_parity():
    """THE definitive two-phase correctness check: with all stochasticity
    zeroed (noise=0, eps=0 so z=mu, dropout off), N full Adam steps of our
    jitted step must reproduce the torch reference trainer's loss
    trajectory. Matching values at step k requires matching GRADIENTS at
    steps < k, so this validates the complete gradient/detach topology of
    both phases (my_trainer.py:241-324)."""
    import dataclasses

    from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step

    ref_models = _ref_models()
    cfg = dataclasses.replace(CFG, act=CFG.act.with_no_dropout())
    torch.manual_seed(7)
    tmodel = ref_models.SoftIntroVAE(cfg.in_ch, [list(b) for b in cfg.block_setting])
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    tmodel.reparameterize = lambda mu, logvar, val_flag=False: mu
    tmodel.train()

    n_vox = int(np.prod(cfg.input_shape))
    scale = 8.0 / n_vox
    beta_rec, beta_neg, beta_kl, gamma_r = 1.0, 1024.0, 0.75, 1e-8
    rng = np.random.RandomState(11)
    x_np = rng.rand(4, *cfg.input_shape).astype(np.float32)

    # ---- torch trajectory (mirrors my_trainer.py:241-324 exactly) ----
    import torch.nn.functional as F

    opt_e = torch.optim.Adam(tmodel.encoder.parameters(), lr=2e-4)
    opt_d = torch.optim.Adam(tmodel.decoder.parameters(), lr=2e-4)

    def recon(a, b, mean):
        m = F.mse_loss(a.reshape(a.size(0), -1), b.reshape(b.size(0), -1),
                       reduction="none").sum(1)
        return m.mean() if mean else m

    def tkl(logvar, mu, mean):
        mu = mu.reshape(mu.size(0), -1); logvar = logvar.reshape(logvar.size(0), -1)
        k = -0.5 * torch.sum(1 + logvar - mu**2 - logvar.exp(), dim=1)
        return k.mean() if mean else k

    x = torch.tensor(x_np[:, None])
    noise = torch.zeros(4, 1, *cfg.latent_spatial_shape)
    t_lossE, t_lossD = [], []
    for _ in range(3):
        for p in tmodel.encoder.parameters():
            p.requires_grad = True
        for p in tmodel.decoder.parameters():
            p.requires_grad = False
        fake = tmodel.decode(noise)
        mu, logvar = tmodel.encode(x)
        z = tmodel.reparameterize(mu, logvar)
        rec = tmodel.decode(z)
        loss_rec = recon(x, rec, True)
        kl_real = tkl(logvar, mu, True)
        rm, rl, zr, rr = tmodel.forward(rec.detach())
        fm, fl, zf, rf = tmodel.forward(fake.detach())
        e_f = (-2 * scale * (beta_rec * recon(fake, rf, False)
                             + beta_neg * tkl(fl, fm, False))).exp().mean()
        e_r = (-2 * scale * (beta_rec * recon(rec, rr, False)
                             + beta_neg * tkl(rl, rm, False))).exp().mean()
        lossE = 10 * (scale * (beta_rec * loss_rec + beta_kl * kl_real)
                      + 0.5 * (e_f + e_r))
        opt_e.zero_grad(); lossE.backward(); opt_e.step()
        for p in tmodel.encoder.parameters():
            p.requires_grad = False
        for p in tmodel.decoder.parameters():
            p.requires_grad = True
        fake = tmodel.decode(noise)
        rec = tmodel.decode(z.detach())
        loss_rec = recon(x, rec, True)
        rm, rl = tmodel.encode(rec)
        zr = tmodel.reparameterize(rm, rl)
        fm, fl = tmodel.encode(fake)
        zf = tmodel.reparameterize(fm, fl)
        rr = tmodel.decode(zr.detach())
        rf = tmodel.decode(zf.detach())
        lossD = 10 * scale * (
            beta_rec * loss_rec + 0.5 * beta_kl * (tkl(rl, rm, True) + tkl(fl, fm, True))
            + gamma_r * 0.5 * beta_rec * (recon(rec.detach(), rr, True)
                                          + recon(fake.detach(), rf, True)))
        opt_d.zero_grad(); lossD.backward(); opt_d.step()
        t_lossE.append(float(lossE)); t_lossD.append(float(lossD))

    # ---- our trajectory from the same imported initial weights ----
    torch.manual_seed(7)
    t2 = ref_models.SoftIntroVAE(cfg.in_ch, [list(b) for b in cfg.block_setting])
    sd = {k: v.detach().numpy() for k, v in t2.state_dict().items()}
    model = make_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32))
    imported = import_spatial_soft_intro_vae(sd, cfg, variables)
    state = create_train_state(
        model, jax.random.key(1),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=100)
    state = state.replace(
        enc_params=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["params"]),
        dec_params=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["params"]),
        enc_stats=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["batch_stats"]),
        dec_stats=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["batch_stats"]))
    loss_cfg = SoftIntroLossConfig(scale=scale)
    step = jax.jit(make_soft_intro_train_step(
        model, loss_cfg, OptimConfig(), 100, cfg.input_shape, zero_noise=True))
    xj = jnp.asarray(x_np[..., None])
    j_lossE, j_lossD = [], []
    for _ in range(3):
        state, metrics = step(state, xj)
        j_lossE.append(float(metrics["lossE"]))
        j_lossD.append(float(metrics["lossD"]))

    np.testing.assert_allclose(j_lossE, t_lossE, rtol=5e-3)
    np.testing.assert_allclose(j_lossD, t_lossD, rtol=5e-3)


def test_fc_training_trajectory_parity():
    """FC-family twin of test_training_trajectory_parity: 3 full Adam steps
    of our jitted two-phase step vs the torch trainer_fc.py semantics
    (vector noise `randn(b, model.z_ch)` trainer_fc.py:218, lossE/lossD x10
    :259-261/296-298, same detach topology as my_trainer) with all
    stochasticity zeroed. Runs at the hardcoded 80x96x80 -> (5,6,5)
    bottleneck with tiny channels."""
    import dataclasses as _dc

    from sivae_tpu.config import FCVAEConfig, OptimConfig, SoftIntroLossConfig
    from sivae_tpu.train.state import create_train_state
    from sivae_tpu.train.step import make_soft_intro_train_step
    from sivae_tpu.utils.torch_import import import_fc_soft_intro_vae

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.mymodel as ref_mymodel

    cfg = FCVAEConfig(first_ch=2, second_ch=3, third_ch=4, forth_ch=5, z_ch=7,
                      input_shape=(80, 96, 80), logvar_head_zero_init=False,
                      logvar_clip=None)
    torch.manual_seed(21)
    tmodel = ref_mymodel.SoftIntroVAE(2, 3, 4, 5, 7)
    tmodel.reparameterize = lambda mu, logvar: mu  # zero-noise: z = mu
    tmodel.train()

    n_vox = int(np.prod(cfg.input_shape))
    scale = 8.0 / n_vox
    beta_rec, beta_neg, beta_kl, gamma_r = 1.0, 1024.0, 0.7, 1e-8
    rng = np.random.RandomState(31)
    x_np = rng.rand(2, *cfg.input_shape).astype(np.float32)

    import torch.nn.functional as F

    opt_e = torch.optim.Adam(tmodel.encoder.parameters(), lr=2e-4)
    opt_d = torch.optim.Adam(tmodel.decoder.parameters(), lr=2e-4)

    def recon(a, b, mean):
        m = F.mse_loss(a.reshape(a.size(0), -1), b.reshape(b.size(0), -1),
                       reduction="none").sum(1)
        return m.mean() if mean else m

    def tkl(logvar, mu, mean):
        mu = mu.reshape(mu.size(0), -1); logvar = logvar.reshape(logvar.size(0), -1)
        k = -0.5 * torch.sum(1 + logvar - mu**2 - logvar.exp(), dim=1)
        return k.mean() if mean else k

    x = torch.tensor(x_np[:, None])
    noise = torch.zeros(2, tmodel.z_ch)  # vector noise (trainer_fc.py:218)
    t_lossE, t_lossD = [], []
    for _ in range(3):
        for p in tmodel.encoder.parameters():
            p.requires_grad = True
        for p in tmodel.decoder.parameters():
            p.requires_grad = False
        fake = tmodel.decode(noise)
        mu, logvar = tmodel.encode(x)
        z = tmodel.reparameterize(mu, logvar)
        rec = tmodel.decode(z)
        loss_rec = recon(x, rec, True)
        kl_real = tkl(logvar, mu, True)
        rm, rl, zr, rr = tmodel.forward(rec.detach())
        fm, fl, zf, rf = tmodel.forward(fake.detach())
        e_f = (-2 * scale * (beta_rec * recon(fake, rf, False)
                             + beta_neg * tkl(fl, fm, False))).exp().mean()
        e_r = (-2 * scale * (beta_rec * recon(rec, rr, False)
                             + beta_neg * tkl(rl, rm, False))).exp().mean()
        lossE = 10 * (scale * (beta_rec * loss_rec + beta_kl * kl_real)
                      + 0.5 * (e_f + e_r))
        opt_e.zero_grad(); lossE.backward(); opt_e.step()
        for p in tmodel.encoder.parameters():
            p.requires_grad = False
        for p in tmodel.decoder.parameters():
            p.requires_grad = True
        fake = tmodel.decode(noise)
        rec = tmodel.decode(z.detach())
        loss_rec = recon(x, rec, True)
        rm, rl = tmodel.encode(rec)
        zr = tmodel.reparameterize(rm, rl)
        fm, fl = tmodel.encode(fake)
        zf = tmodel.reparameterize(fm, fl)
        rr = tmodel.decode(zr.detach())
        rf = tmodel.decode(zf.detach())
        lossD = 10 * scale * (
            beta_rec * loss_rec + 0.5 * beta_kl * (tkl(rl, rm, True) + tkl(fl, fm, True))
            + gamma_r * 0.5 * beta_rec * (recon(rec.detach(), rr, True)
                                          + recon(fake.detach(), rf, True)))
        opt_d.zero_grad(); lossD.backward(); opt_d.step()
        t_lossE.append(float(lossE.detach())); t_lossD.append(float(lossD.detach()))

    # ---- our trajectory from the same imported initial weights ----
    torch.manual_seed(21)
    t2 = ref_mymodel.SoftIntroVAE(2, 3, 4, 5, 7)
    sd = {k: v.detach().numpy() for k, v in t2.state_dict().items()}
    model = make_model(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32))
    imported = import_fc_soft_intro_vae(sd, cfg, variables)
    state = create_train_state(
        model, jax.random.key(1),
        jnp.zeros((1,) + cfg.input_shape + (1,), jnp.float32),
        OptimConfig(), steps_per_epoch=100)
    state = state.replace(
        enc_params=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["params"]),
        dec_params=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["params"]),
        enc_stats=jax.tree_util.tree_map(jnp.asarray, imported["enc"]["batch_stats"]),
        dec_stats=jax.tree_util.tree_map(jnp.asarray, imported["dec"]["batch_stats"]))
    loss_cfg = SoftIntroLossConfig(scale=scale, beta_kl=beta_kl)
    step = jax.jit(make_soft_intro_train_step(
        model, loss_cfg, OptimConfig(), 100, cfg.input_shape, zero_noise=True))
    xj = jnp.asarray(x_np[..., None])
    j_lossE, j_lossD = [], []
    for _ in range(3):
        state, metrics = step(state, xj)
        j_lossE.append(float(metrics["lossE"]))
        j_lossD.append(float(metrics["lossD"]))

    np.testing.assert_allclose(j_lossE, t_lossE, rtol=5e-3)
    np.testing.assert_allclose(j_lossD, t_lossD, rtol=5e-3)
