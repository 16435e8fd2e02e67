"""Configuration dataclasses for models, losses, optimization and training.

The reference spreads experiment configuration over per-script argparse
defaults and hard-coded constructor calls (reference main.py:36-48,
z-1200main.py:36-60, 600z_main.py:36-68). Here every experiment is a single
serializable config tree.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Model configs
# ---------------------------------------------------------------------------

# A block line is (channels, num_blocks, stride) — same encoding the reference
# uses for its `block_setting` lists (reference models/models.py:97-102).
BlockLine = Tuple[int, int, int]


@dataclass(frozen=True)
class ActivationConfig:
    """Activation/dropout scheme distinguishing the reference model variants.

    - models.py    : leaky_relu(0.2) body, relu decoder tail, dropout on
    - models-conv-b-ReLU.py : leaky_relu everywhere, no dropout
    - vaemodel.py  : relu body, relu tail, no dropout
    """

    body_act: str = "leaky_relu"      # "leaky_relu" | "relu"
    negative_slope: float = 0.2
    decoder_tail_act: str = "relu"    # activation on the decoder output conv
    stem_dropout: float = 0.35        # encoder stem (reference models/models.py:95)
    dec_in_dropout: float = 0.25      # decoder input block (models.py:122)
    dec_out_dropout: float = 0.35     # decoder output block (models.py:140)

    def with_no_dropout(self) -> "ActivationConfig":
        return dataclasses.replace(
            self, stem_dropout=0.0, dec_in_dropout=0.0, dec_out_dropout=0.0
        )


@dataclass(frozen=True)
class SpatialVAEConfig:
    """Spatial-latent ResNet S-IntroVAE/VAE/CAE family.

    Mirrors reference models/models.py ResNetEncoder/ResNetDecoder driven by
    `block_setting`; the latent is a 1-channel spatial map (e.g. 10x12x10 =
    1200-d for `SoftIntroVAE(64, [[64,1,2],[128,1,2],[256,2,2]])`,
    reference z-1200main.py:158).
    """

    in_ch: int = 64
    block_setting: Tuple[BlockLine, ...] = ((64, 1, 2), (128, 1, 2), (256, 2, 2))
    input_shape: Tuple[int, int, int] = (80, 96, 80)  # D, H, W
    act: ActivationConfig = field(default_factory=ActivationConfig)
    variational: bool = True   # False => CAE (single 1x1 head, no mu/var)
    dtype: Any = jnp.float32   # compute dtype (bfloat16 on TPU hot path)
    param_dtype: Any = jnp.float32
    # rematerialize each block in the backward pass: the two-phase step runs
    # 12 forwards before its two backwards — without remat the flagship
    # config needs ~18GB of live activations (> v5e 16GB HBM)
    remat: bool = True
    # remat policy: None saves only block boundaries (backward recomputes
    # whole blocks, convs included); the "conv_outs*" family additionally
    # saves tagged 3x3x3 conv outputs inside the blocks, so the backward
    # recomputes only the cheap VPU tail (BN/act/pool) — trading HBM for
    # MXU FLOPs. Measured on v5e (tools/perf_sweep.py, batch 8 bf16
    # flagship, vol/s | HLO temp): block-only 4.44 | 11.6G; conv_outs
    # (save all) 5.33 | 16.7G — fastest but over the 15.75G HBM, XLA
    # compresses, and real training (train + eval programs resident) OOMs;
    # conv_outs_no_dec_hi (recompute only decoder full-res convs)
    # 5.14 | 15.1G — the fastest variant that FITS, the default;
    # conv_outs_no_enc_hi 4.89 | 15.2G; conv_outs_lo 4.74 | 13.5G.
    remat_policy: Optional[str] = "conv_outs_no_dec_hi"
    # Early-training stability (deviations from the reference, both of which
    # only matter in the first steps; disable for strict init parity):
    # - zero-init the logvar head so e^logvar starts at 1 — the He-initialized
    #   BN-conv body is chaotic enough at flagship width that one bounded
    #   Adam step otherwise swings logvar by ~±15 (KL ~1e17, NaN in the
    #   reference this manifests as its SystemError NaN guard tripping)
    # - hard-clip logvar as a NaN rail; never active in healthy training
    logvar_head_zero_init: bool = True
    logvar_clip: Optional[Tuple[float, float]] = (-30.0, 20.0)
    # route 3x3x3 stride-1 convs through the Pallas implicit-GEMM kernel
    use_pallas_conv: bool = False
    # route the two 1-channel-sided 3x3x3 convs (decoder tail C->1, encoder
    # stem 1->C) through the Pallas VPU stencil kernels
    # (kernels/conv3d_small.py). Hypothesis was sound (an MXU conv with a
    # 1-channel side uses 1/128 of the systolic array and these were ~12%
    # of the flagship step) but the measured A/B at batch 8 is a 12%
    # REGRESSION (4.62 vs 5.23 vol/s, docs/PERF.md round 3): XLA keeps the
    # 1-ch-sided convs overlapped with MXU work while the pallas_call is a
    # serialization point. Kernels + sweep variant kept as the recorded
    # experiment; default is now OFF ("auto" = on iff on TPU, for re-runs
    # of the experiment).
    use_pallas_small_ch: Any = False
    # exact algebraic fusion of nearest-upsample(2)+conv in decoder UpBlocks
    # (27 -> 8 taps per output voxel; no 8x intermediate tensor)
    fuse_upconv: bool = True
    # (round 5) the fused conv+BN-stat Pallas megakernel's model routing
    # (use_fused_conv_bn) was REMOVED: the TPU A/B it awaited finally ran
    # and the kernel lost decisively — fused stage 31.0 ms vs XLA 24.0 ms
    # on the target shape bf16[8,80,96,80,64] (docs/AB_MEGAKERNEL_r05.json,
    # docs/PERF.md round 5). The kernel stays in kernels/conv3d_fused.py as
    # the recorded experiment (tools/megakernel_ab.py re-runs it).

    @property
    def latent_spatial_shape(self) -> Tuple[int, int, int]:
        d, h, w = self.input_shape
        for _, _, s in self.block_setting:
            d, h, w = d // s, h // s, w // s
        return (d, h, w)

    @property
    def latent_shape(self) -> Tuple[int, int, int, int]:
        """Per-sample latent shape in NDHWC (trailing channel of 1)."""
        return self.latent_spatial_shape + (1,)

    @property
    def latent_dim(self) -> int:
        d, h, w = self.latent_spatial_shape
        return d * h * w


@dataclass(frozen=True)
class FCVAEConfig:
    """FC-latent ("vector z") family, reference models/mymodel.py.

    Four stages of stride-2 AvgPool with hand-placed skip connections down to
    a (5,6,5) grid, then Linear(forth_ch*150 -> 2*z_ch) split into (mu,
    logvar); z_ch in {150, 300, 600} (reference 600z_main.py:176).
    """

    first_ch: int = 12
    second_ch: int = 24
    third_ch: int = 32
    forth_ch: int = 48
    z_ch: int = 150
    input_shape: Tuple[int, int, int] = (80, 96, 80)
    act: ActivationConfig = field(
        default_factory=lambda: ActivationConfig().with_no_dropout()
    )
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    remat: bool = True
    remat_policy: Optional[str] = "conv_outs_no_dec_hi"  # see SpatialVAEConfig
    logvar_head_zero_init: bool = True
    logvar_clip: Optional[Tuple[float, float]] = (-30.0, 20.0)
    use_pallas_conv: bool = False
    fuse_upconv: bool = True

    @property
    def bottleneck_spatial_shape(self) -> Tuple[int, int, int]:
        d, h, w = self.input_shape
        return (d // 16, h // 16, w // 16)

    @property
    def latent_shape(self) -> Tuple[int, ...]:
        return (self.z_ch,)

    @property
    def latent_dim(self) -> int:
        return self.z_ch


# ---------------------------------------------------------------------------
# Loss / optimization / training configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SoftIntroLossConfig:
    """Soft-IntroVAE loss hyper-parameters (reference utils/my_trainer.py:188-198).

    `scale` is the paper's normalizing constant s; the reference uses
    8 / (80*96*80).  `loss_multiplier` reproduces the x10 applied to both
    lossE and lossD (my_trainer.py:284,321); the DataParallel variant uses
    multiplier 1.0 and expELBO weight 0.25 (main_DataParallel.py:470).
    """

    beta_rec: float = 1.0
    beta_neg: float = 1024.0
    beta_kl: float = 0.75
    gamma_r: float = 1e-8
    scale: Optional[float] = None  # None => 8 / prod(input_shape)
    exp_elbo_weight: float = 0.5
    loss_multiplier: float = 10.0
    # Faithful main_DataParallel.py step semantics (oracle-verified against
    # an execution of that trainer). Beyond the weight/multiplier/scale
    # differences above, the DP trainer diverges from my_trainer in four
    # load-bearing ways:
    #   1. its calc_kl (:87-98) never flattens — `.sum(1)` hits the
    #      singleton channel of the conv latent, so every KL is
    #      PER-POSITION ((B,5,6,5)); 'mean' divides by B*150;
    #   2. its calc_reconstruction_loss (:108-116) IGNORES `reduction` —
    #      the "none" calls inside expELBO still return the batch-mean
    #      scalar, so expELBO mixes a scalar recon with per-position KL;
    #   3. phase D's loss_rec uses rec.DETACH() (:481) — the decoder gets
    #      no reconstruction gradient from that term;
    #   4. phase D re-decodes z_rec / z_fake WITHOUT detaching them
    #      (:489-490 vs my_trainer.py:310-311), adding a gamma_r-weighted
    #      gradient path decoder <- rec_rec <- z_rec <- rec <- decoder.
    dp_semantics: bool = False

    def resolved_scale(self, input_shape: Sequence[int]) -> float:
        if self.scale is not None:
            return self.scale
        n = 1
        for s in input_shape:
            n *= s
        return 8.0 / n


@dataclass(frozen=True)
class OptimConfig:
    """Adam + MultiStep LR (reference my_trainer.py:183-186)."""

    lr: float = 2e-4
    milestones: Tuple[int, ...] = (350,)  # in epochs
    gamma: float = 0.1
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 500
    batch_size: int = 8
    seed: int = 77                 # trainer seed (my_trainer.py:160)
    steps_per_epoch: Optional[int] = None  # None => derived from dataset
    num_epochs_warm_start: int = 0
    checkpoint_every_epochs: int = 1
    eval_every_epochs: int = 1
    val_eps: float = 0.1           # fixed val-reparam eps (models/models.py:269)
    log_images_every_epochs: int = 20
    mesh_shape: Tuple[int, ...] = (-1,)   # data-parallel axis; -1 => all devices
    mesh_axis_names: Tuple[str, ...] = ("data",)


def to_json(cfg: Any) -> str:
    """Serialize any config dataclass tree to JSON (for run provenance,
    replacing the reference's `my_args.txt` dump, main.py:152-153)."""

    def default(o: Any):
        if dataclasses.is_dataclass(o):
            return dataclasses.asdict(o)
        if hasattr(o, "dtype") or isinstance(o, type):
            return str(o)
        return str(o)

    return json.dumps(dataclasses.asdict(cfg), default=default, indent=2)
