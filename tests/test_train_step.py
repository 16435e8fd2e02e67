"""Tests for the jitted two-phase Soft-IntroVAE step and VAE/CAE steps.

Covers: metric sanity, parameter/BN-state updates, determinism, and
single-device vs 8-device data-parallel equivalence (the DataParallel
replacement, SURVEY §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sivae_tpu.config import OptimConfig, SoftIntroLossConfig
from sivae_tpu.models.registry import get_model_config, make_model
from sivae_tpu.parallel import make_mesh, replicate_state, shard_batch
from sivae_tpu.train import (
    create_train_state,
    make_cae_train_step,
    make_soft_intro_eval_step,
    make_soft_intro_train_step,
    make_vae_train_step,
)

CFG = get_model_config("tiny_spatial")
LOSS = SoftIntroLossConfig(scale=8.0 / (16 * 16 * 16))
OPT = OptimConfig()


def _setup(batch=8, seed=0):
    model = make_model(CFG)
    x = jax.random.uniform(jax.random.key(seed), (batch,) + CFG.input_shape + (1,))
    state = create_train_state(model, jax.random.key(1), x[:1], OPT, steps_per_epoch=10)
    step = make_soft_intro_train_step(model, LOSS, OPT, 10, CFG.input_shape)
    return model, x, state, step


@pytest.fixture(scope="module")
def trained_once():
    model, x, state, step = _setup()
    jstep = jax.jit(step, donate_argnums=(0,))
    snap = jax.tree_util.tree_map(
        np.array, (state.enc_params, state.dec_params, state.enc_stats, state.dec_stats))
    new_state, metrics = jstep(state, x)
    return model, x, snap, new_state, jax.device_get(metrics)


def test_metrics_finite(trained_once):
    *_, metrics = trained_once
    for k, v in metrics.items():
        if k == "nan":
            assert not bool(v)
        else:
            assert np.isfinite(v), f"{k} not finite: {v}"


def test_params_and_stats_update(trained_once):
    _, _, snap, new_state, _ = trained_once
    enc_p0, dec_p0, enc_s0, dec_s0 = snap
    assert int(new_state.step) == 1

    def changed(old_tree, new_tree):
        olds = jax.tree_util.tree_leaves(old_tree)
        news = jax.tree_util.tree_leaves(new_tree)
        return any(not np.allclose(o, np.asarray(n)) for o, n in zip(olds, news))

    assert changed(enc_p0, new_state.enc_params), "encoder must update"
    assert changed(dec_p0, new_state.dec_params), "decoder must update"
    assert changed(enc_s0, new_state.enc_stats), "enc BN stats must update"
    assert changed(dec_s0, new_state.dec_stats), "dec BN stats must update"


def test_step_deterministic():
    model, x, state, step = _setup()
    jstep = jax.jit(step)
    s1, m1 = jstep(state, x)
    s2, m2 = jstep(state, x)
    np.testing.assert_array_equal(np.asarray(m1["lossE"]), np.asarray(m2["lossE"]))
    for a, b in zip(jax.tree_util.tree_leaves(s1.enc_params),
                    jax.tree_util.tree_leaves(s2.enc_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_data_parallel_matches_single_device():
    """jit+GSPMD over an 8-device mesh must reproduce the single-device step."""
    model, x, state, step = _setup(batch=8)
    jstep = jax.jit(step)
    ref_state, ref_metrics = jstep(state, x)

    mesh = make_mesh((8,), ("data",))
    dp_state = replicate_state(state, mesh)
    dp_x = shard_batch(np.asarray(x), mesh)
    dp_new, dp_metrics = jstep(dp_state, dp_x)

    np.testing.assert_allclose(
        float(ref_metrics["lossE"]), float(dp_metrics["lossE"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(ref_metrics["lossD"]), float(dp_metrics["lossD"]), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.enc_params),
                    jax.tree_util.tree_leaves(dp_new.enc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_eval_step_runs():
    model, x, state, _ = _setup()
    ev = jax.jit(make_soft_intro_eval_step(model, LOSS, CFG.input_shape))
    metrics = jax.device_get(ev(state, x, jax.random.key(3)))
    for k, v in metrics.items():
        assert np.isfinite(v), f"{k} not finite"


def test_eval_deterministic_given_rng():
    model, x, state, _ = _setup()
    ev = jax.jit(make_soft_intro_eval_step(model, LOSS, CFG.input_shape))
    m1 = ev(state, x, jax.random.key(3))
    m2 = ev(state, x, jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(m1["lossE"]), np.asarray(m2["lossE"]))


def test_vae_train_step():
    cfg = get_model_config("tiny_spatial")
    model = make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (4,) + cfg.input_shape + (1,))
    state = create_train_state(model, jax.random.key(1), x[:1], OPT,
                               steps_per_epoch=10, joint_optimizer=True)
    step = jax.jit(make_vae_train_step(model, OPT, 10, mse_w=1.0, kl_w=20.0))
    new_state, metrics = step(state, x)
    assert np.isfinite(metrics["loss"])
    assert int(new_state.step) == 1


def test_cae_train_step():
    import dataclasses

    from sivae_tpu.models.resnet_vae import SpatialDecoder, SpatialEncoder
    from sivae_tpu.train.state import SIVAETrainState, make_optimizer

    cfg = dataclasses.replace(get_model_config("tiny_spatial"), variational=False)
    enc, dec = SpatialEncoder(cfg), SpatialDecoder(cfg)
    x = jax.random.uniform(jax.random.key(0), (4,) + cfg.input_shape + (1,))
    ev = enc.init({"params": jax.random.key(1), "dropout": jax.random.key(2)}, x)
    z = enc.apply(ev, x, train=False)
    dv = dec.init({"params": jax.random.key(3), "dropout": jax.random.key(4)}, z)
    opt = make_optimizer(OPT, 10)
    params = (ev["params"], dv["params"])
    state = SIVAETrainState(
        enc_params=ev["params"], dec_params=dv["params"],
        enc_stats=ev.get("batch_stats", {}), dec_stats=dv.get("batch_stats", {}),
        opt_e=opt.init(params), opt_d=(),
        rng=jax.random.key(5), step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(make_cae_train_step(enc, dec, OPT, 10))
    new_state, metrics = step(state, x)
    assert np.isfinite(metrics["loss"])


def test_remat_calls_mode_matches_block_remat():
    """Function-level checkpointing must not change the math."""
    import dataclasses

    cfg = dataclasses.replace(CFG, remat=False)
    model = make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (4,) + cfg.input_shape + (1,))
    state_a = create_train_state(model, jax.random.key(1), x[:1], OPT, 10)
    state_b = create_train_state(model, jax.random.key(1), x[:1], OPT, 10)
    step_plain = jax.jit(make_soft_intro_train_step(model, LOSS, OPT, 10, cfg.input_shape))
    step_ckpt = jax.jit(make_soft_intro_train_step(model, LOSS, OPT, 10, cfg.input_shape,
                                                   remat_calls=True))
    sa, ma = step_plain(state_a, x)
    sb, mb = step_ckpt(state_b, x)
    np.testing.assert_allclose(float(ma["lossE"]), float(mb["lossE"]), rtol=1e-6)
    np.testing.assert_allclose(float(ma["lossD"]), float(mb["lossD"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sa.enc_params),
                    jax.tree_util.tree_leaves(sb.enc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_conv_outs_remat_policy_matches_default():
    """Remat policies (save tagged conv outputs vs block boundaries only)
    change scheduling, never math — losses and updates agree to float noise.

    NB deliberately compares only remat=True variants: flax nn.remat renames
    the module path ("CheckpointConvBlock_0"), which changes the
    path-folded RNG streams for BOTH param init and dropout, so remat
    on/off models legitimately differ from step 0. The remat=True model's
    math is instead validated externally by the torch trajectory-parity
    tests, and remat_calls-vs-plain (same model instance, same init) by
    test_remat_calls_mode_matches_block_remat."""
    import dataclasses

    from sivae_tpu.config import SpatialVAEConfig

    cfg0 = SpatialVAEConfig(in_ch=4, block_setting=((4, 1, 2), (8, 2, 2)),
                            input_shape=(8, 8, 8))
    loss = SoftIntroLossConfig(scale=8.0 / 512)
    x = jax.random.uniform(jax.random.key(0), (2,) + cfg0.input_shape + (1,))

    def run(cfg):
        model = make_model(cfg)
        state = create_train_state(model, jax.random.key(1), x[:1], OPT, 10)
        step = jax.jit(make_soft_intro_train_step(model, loss, OPT, 10,
                                                  cfg.input_shape))
        return step(state, x)

    # dropout active: every remat=True policy is bit-identical
    (s0, m0) = run(dataclasses.replace(cfg0, remat_policy=None))
    for policy in ("conv_outs", "conv_outs_lo",
               "conv_outs_no_dec_hi", "conv_outs_no_enc_hi"):
        s, m = run(dataclasses.replace(cfg0, remat_policy=policy))
        np.testing.assert_allclose(float(m0["lossE"]), float(m["lossE"]), rtol=1e-6)
        np.testing.assert_allclose(float(m0["lossD"]), float(m["lossD"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s0.enc_params),
                        jax.tree_util.tree_leaves(s.enc_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
