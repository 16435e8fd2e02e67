"""Tests: profiling helpers, checkify NaN localization, metrics logger."""

import jax.numpy as jnp
import pytest

from sivae_tpu.utils.profiling import StepTimer, compiled_cost
from sivae_tpu.utils.debugging import checkify_step
from sivae_tpu.utils.logging import MetricsLogger


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["n"] == 3 and s["mean_s"] >= 0


def test_compiled_cost_reports_flops():
    def f(a, b):
        return a @ b

    a = jnp.ones((128, 128))
    cost = compiled_cost(f, a, a)
    assert cost["flops"] > 1e6  # 2*128^3 ~ 4.2e6


def test_checkify_locates_nan():
    def bad_step(state, batch):
        return state, {"loss": jnp.log(batch).sum()}  # log(-1) -> nan

    wrapped = checkify_step(bad_step)
    err, (state, metrics) = wrapped(jnp.zeros(()), jnp.array([-1.0]))
    with pytest.raises(Exception):
        err.throw()
    # clean input -> no error
    err2, _ = wrapped(jnp.zeros(()), jnp.array([1.0]))
    err2.throw()


def test_metrics_logger_files(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.append(train_lossE=1.0, val_lossE=2.0, train_lossD=3.0, val_lossD=4.0,
              kls_real=0.1, kls_fake=0.2, kls_rec=0.3, rec_errs=0.4)
    lg.write_epoch(0, {"train_lossE": 1.0, "train_lossD": 3.0,
                       "val_lossE": 2.0, "val_lossD": 4.0})
    lg.write_loss_txt()
    lg.write_kl_txt()
    assert (tmp_path / "train_result.csv").exists()
    loss_txt = (tmp_path / "loss.txt").read_text()
    assert "trainE=1.0" in loss_txt and "valD===4.0" in loss_txt
    kl_txt = (tmp_path / "kl_losses.txt").read_text()
    assert "kls_real==0.1" in kl_txt and "rec_errs==0.4" in kl_txt
    jsonl = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(jsonl) == 1


def test_bench_backend_probe_cpu(monkeypatch):
    """bench.probe_backend must pass quickly on a healthy CPU backend
    (and retry then exit(2) when the backend stays unreachable —
    exercised manually against the downed TPU relay, not in CI).
    Pin the subprocess probe to CPU: without this, a host carrying the
    remote-TPU sitecustomize and a downed relay fails the probe even
    though this test is about the healthy-CPU path."""
    import bench

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench.probe_backend(probe_timeout_s=120, retry_window_s=0)


def test_oracle_cache_roundtrip(tmp_path, monkeypatch):
    """pack_state/unpack_state + save/load round-trip (the oracle tier's
    replay memoization, VERDICT r4 next-#8): every tree leaf, both Adam
    moment trees, counts and extras survive the npz trip bit-exactly."""
    from types import SimpleNamespace

    import numpy as np

    import oracle_cache

    monkeypatch.setattr(oracle_cache, "CACHE_DIR", str(tmp_path))
    rng = np.random.RandomState(0)
    params_e = {"Conv_0": {"kernel": rng.randn(3, 3, 3, 2, 4).astype(np.float32)},
                "BN_0": {"scale": rng.randn(4).astype(np.float32)}}
    params_d = {"Conv_1": {"kernel": rng.randn(1, 1, 1, 4, 2).astype(np.float32)}}
    stats_e = {"BN_0": {"mean": rng.randn(4).astype(np.float32),
                        "var": rng.rand(4).astype(np.float32)}}
    stats_d = {"BN_1": {"mean": rng.randn(2).astype(np.float32),
                        "var": rng.rand(2).astype(np.float32)}}
    mk = lambda t: {k: {k2: v2 * 0.1 for k2, v2 in v.items()}
                    for k, v in t.items()}
    state = SimpleNamespace(
        enc_params=params_e, dec_params=params_d,
        enc_stats=stats_e, dec_stats=stats_d,
        opt_e=(SimpleNamespace(mu=mk(params_e), nu=mk(params_e),
                               count=np.int32(5)),),
        opt_d=(SimpleNamespace(mu=mk(params_d), nu=mk(params_d),
                               count=np.int32(5)),))
    flat = oracle_cache.pack_state(state, extra={"lossE": [1.0, 2.0],
                                                 "val_e": 3.5})
    oracle_cache.save("t", "k", flat)
    loaded = oracle_cache.load("t", "k")
    assert oracle_cache.load("t", "other") is None
    imported = {"enc": {"params": params_e, "batch_stats": stats_e},
                "dec": {"params": params_d, "batch_stats": stats_d}}
    out, extra = oracle_cache.unpack_state(loaded, imported)
    np.testing.assert_array_equal(
        out.enc_params["Conv_0"]["kernel"], params_e["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        out.opt_d[0].mu["Conv_1"]["kernel"],
        0.1 * params_d["Conv_1"]["kernel"].astype(np.float32))
    assert int(out.opt_e[0].count) == 5
    np.testing.assert_array_equal(extra["lossE"], [1.0, 2.0])
    assert float(extra["val_e"]) == 3.5
    # key changes when a source file changes (conservative invalidation)
    k1 = oracle_cache.replay_key(__file__)
    assert k1 == oracle_cache.replay_key(__file__)
    assert k1 != oracle_cache.replay_key()
