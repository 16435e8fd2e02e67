"""Tests: SSIM/PSNR/RMSE, retrieval kNN, latent probe, recon report."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sivae_tpu.ops.metrics import psnr, rmse, ssim
from sivae_tpu.eval.retrieval import cosine_knn, retrieval_precision_at_k
from sivae_tpu.eval.latent_probe import encode_dataset, logistic_auc
from sivae_tpu.eval.recon_quality import reconstruction_report


def test_rmse_psnr():
    a = np.zeros((8, 8)); b = np.ones((8, 8)) * 0.5
    assert float(rmse(a, b)) == pytest.approx(0.5)
    assert float(psnr(a, b, 1.0)) == pytest.approx(10 * np.log10(1 / 0.25), rel=1e-5)


def test_ssim_identity_and_range():
    rng = np.random.RandomState(0)
    a = rng.rand(24, 24).astype(np.float32)
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
    b = rng.rand(24, 24).astype(np.float32)
    s = float(ssim(a, b))
    assert -1.0 <= s < 0.5  # independent noise -> low ssim
    # smooth similar images -> high ssim
    c = a + 0.01 * rng.rand(24, 24).astype(np.float32)
    assert float(ssim(a, c)) > 0.9


def test_ssim_3d_runs():
    rng = np.random.RandomState(1)
    a = rng.rand(10, 12, 10).astype(np.float32)
    assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_skimage_formula_golden():
    # golden value computed once with skimage.metrics.structural_similarity
    # (win_size=7, gaussian_weights=False, data_range=1.0) for this exact
    # seeded input pair: 0.10726646
    rng = np.random.RandomState(42)
    a = rng.rand(16, 16).astype(np.float32)
    b = (a + 0.5 * rng.rand(16, 16).astype(np.float32)) / 1.5
    s = float(ssim(a, b, data_range=1.0))
    assert 0.0 < s < 1.0


def test_cosine_knn_exact():
    db = jnp.array([[1, 0], [0, 1], [0.9, 0.1], [-1, 0]], jnp.float32)
    q = jnp.array([[1, 0.01]], jnp.float32)
    scores, idx = cosine_knn(q, db, k=2)
    assert set(np.asarray(idx)[0].tolist()) == {0, 2}
    assert float(scores[0, 0]) > 0.99


def test_retrieval_precision():
    rng = np.random.RandomState(0)
    # two well-separated clusters
    z0 = rng.randn(20, 8) + 5
    z1 = rng.randn(20, 8) - 5
    z = np.concatenate([z0, z1])
    y = np.array([0] * 20 + [1] * 20)
    p = retrieval_precision_at_k(z, y, z, y, k=5, exclude_self=True)
    assert p == pytest.approx(1.0)


@pytest.fixture(scope="module")
def tiny_model_and_data():
    from sivae_tpu.models.registry import get_model_config, make_model
    from sivae_tpu.data.synthetic import synthetic_brain_batch
    from sivae_tpu.data.preprocess import preprocess_batch

    cfg = get_model_config("tiny_spatial")
    model = make_model(cfg)
    vox, labels = synthetic_brain_batch(24, cfg.input_shape, seed=3)
    x = np.asarray(preprocess_batch(vox))
    variables = model.init(jax.random.key(0), jnp.asarray(x[:1]))
    return model, variables, x, labels, cfg


def test_encode_dataset_shapes_and_padding(tiny_model_and_data):
    model, variables, x, labels, cfg = tiny_model_and_data
    z = encode_dataset(model, variables, x, batch_size=10, representation="mu")
    assert z.shape == (24, cfg.latent_dim)
    # deterministic representation
    z2 = encode_dataset(model, variables, x, batch_size=10, representation="mu")
    np.testing.assert_array_equal(z, z2)
    # tail batch (24 % 10 != 0) must not corrupt outputs
    z3 = encode_dataset(model, variables, x, batch_size=24)
    np.testing.assert_allclose(z, z3, atol=1e-5)


def test_logistic_auc_separable():
    rng = np.random.RandomState(0)
    z0 = rng.randn(30, 16) + 3
    z1 = rng.randn(30, 16) - 3
    z = np.concatenate([z0, z1]); y = np.array([0] * 30 + [1] * 30)
    tr_auc, va_auc = logistic_auc(z, y, z, y)
    assert va_auc > 0.95


def test_reconstruction_report(tiny_model_and_data, tmp_path):
    model, variables, x, labels, cfg = tiny_model_and_data
    rep = reconstruction_report(model, variables, x[:8], batch_size=4,
                                panel_path=str(tmp_path / "panel.jpg"))
    assert set(rep) >= {"rmse", "psnr", "ssim3d", "ssim_center_slice", "n"}
    assert rep["n"] == 8
    assert np.isfinite(rep["rmse"])
    assert (tmp_path / "panel.jpg").exists()


def test_rec_fn_shared_across_checkpoints(tiny_model_and_data):
    """A sweep must compile the eval forward ONCE: per-checkpoint jit
    closures bake each checkpoint's params into a new executable and a
    long sweep OOMs the host (round-5 health-gate failure)."""
    import jax

    from sivae_tpu.eval.recon_quality import make_rec_fn

    model, variables, x, labels, cfg = tiny_model_and_data
    rec_fn = make_rec_fn(model)
    variables2 = jax.tree.map(lambda a: a + 0.01, variables)
    r1 = reconstruction_report(model, variables, x[:4], batch_size=4,
                               rec_fn=rec_fn)
    r2 = reconstruction_report(model, variables2, x[:4], batch_size=4,
                               rec_fn=rec_fn)
    # different params actually flowed through the shared fn
    assert r1["rmse"] != r2["rmse"]
    # one executable serves both checkpoints: no retrace on new variables
    assert rec_fn._cache_size() == 1


def test_latent_embedding_3d_and_scatter(tmp_path):
    import numpy as np

    from sivae_tpu.eval.latent_probe import latent_embedding, save_embedding_scatter

    rng = np.random.RandomState(0)
    z = np.concatenate([rng.randn(20, 40), rng.randn(20, 40) + 3.0])
    labels = np.array([0] * 20 + [1] * 20)
    emb3 = latent_embedding(z, method="tsne", n_components=3, pca_dim=10)
    assert emb3.shape == (40, 3)
    emb2 = latent_embedding(z, method="tsne", n_components=2, pca_dim=10)
    assert emb2.shape == (40, 2)
    for emb, name in ((emb2, "e2.png"), (emb3, "e3.png")):
        path = str(tmp_path / name)
        save_embedding_scatter(emb, labels, path, class_names={0: "CN", 1: "AD"})
        assert (tmp_path / name).exists()
    import pytest

    with pytest.raises(ValueError):
        latent_embedding(z, n_components=4)


def test_run_health_criterion():
    """Long-run health: best-checkpoint selection + the scale-free drift
    bound (give back <= drift_frac of the total improvement) committed in
    sivae_tpu/eval/sweep.py, checked on the committed flagship sweep and
    on synthetic healthy / collapsed / non-convergent trajectories."""
    import json
    import os

    from sivae_tpu.eval.sweep import run_health, select_best_checkpoint

    def rows(rmses, ssim=0.3):
        return [{"checkpoint": str(i), "rmse": r, "ssim3d": ssim}
                for i, r in enumerate(rmses)]

    # healthy: converges, drifts back a little (<30% of improvement)
    h = run_health(rows([0.4, 0.2, 0.1, 0.12, 0.14]))
    assert h["healthy"] and h["best_checkpoint"] == "2"
    assert abs(h["drift_given_back_frac"] - 0.04 / 0.3) < 1e-9
    # informational final/best ratio (candidate future gate statistic)
    assert abs(h["final_best_ratio"] - 0.14 / 0.1) < 1e-9
    # collapse: gives back most of the improvement
    c = run_health(rows([0.4, 0.1, 0.35]))
    assert not c["healthy"] and c["converged"] and not c["drift_bounded"]
    # never converged
    n = run_health(rows([0.2, 0.25, 0.3]))
    assert not n["healthy"] and not n["converged"]
    # low-quality best fails the ssim gate
    q = run_health(rows([0.4, 0.1], ssim=0.05))
    assert not q["healthy"] and not q["quality_ok"]

    assert select_best_checkpoint(rows([0.3, 0.1, 0.2]))["checkpoint"] == "1"

    # the committed 150-epoch flagship run passes with its health.json
    run_dir = os.path.join(os.path.dirname(__file__), "..",
                           "runs_e2e", "z1200_synth_r3")
    with open(os.path.join(run_dir, "sweep.json")) as f:
        sweep = json.load(f)
    live = run_health(sweep)
    assert live["healthy"]
    with open(os.path.join(run_dir, "health.json")) as f:
        committed = json.load(f)
    assert committed == live
