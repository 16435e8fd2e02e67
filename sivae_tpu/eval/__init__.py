from sivae_tpu.eval.latent_probe import encode_dataset, logistic_auc, latent_2d_embedding  # noqa: F401
from sivae_tpu.eval.retrieval import cosine_knn, retrieval_precision_at_k  # noqa: F401
from sivae_tpu.eval.recon_quality import reconstruction_report  # noqa: F401
