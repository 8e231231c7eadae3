"""Typed configuration for the TPU-native multi-generator SR-GAN framework.

Replaces the reference's two config mechanisms — module constants in
``src/variables.py:1-6`` (dataset paths, ``clip_width=1024``/``clip_height=512``)
and hyperparameters hardcoded in ``src/train.py`` (epochs ``train.py:23``,
batch 12 ``train.py:94-95``, Adam LRs ``train.py:40-41``, LinearLR 1→0.01
``train.py:70-71``, split 0.7 ``train.py:82``) — with one typed dataclass tree
covering every BASELINE config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """SRResNet generator hyperparameters (reference ``src/models.py:44-87``)."""

    in_channels: int = 3
    num_features: int = 64
    num_residuals: int = 16
    upscale_factor: int = 4  # power of two: 2, 4, 8
    # The reference uses BatchNorm (``models.py:16,19``) but flags it as broken
    # for distributed training (``readme.md:20``). GroupNorm is mesh-safe: its
    # statistics are per-sample, so it needs no cross-device sync.
    norm: str = "group"  # "group" | "none"
    group_norm_groups: int = 8
    # RGB output head: "subpixel" folds the final 9x9 conv through the last
    # pixel-shuffle (same function class, ~2.6x faster on TPU — the 9x9 conv
    # at full output resolution is HBM-bound); "reference" keeps the
    # reference's post-shuffle conv9x9 layout (``src/models.py:78,86``).
    head: str = "subpixel"
    # jax.checkpoint each residual block (more FLOPs, far less activation
    # HBM — bigger batches/images per chip).
    remat: bool = False
    # NOTE (r3): the former ``scan_blocks`` knob (lax.scan over the residual
    # tower for smaller HLO) was REMOVED after measurement on the real chip:
    # without remat the scan-stacked residuals exceed HBM at flagship size
    # (compile-time OOM: 20.17G of 15.75G — XLA cannot rematerialize across
    # a scan), and with per-block remat the scanned gradient graph compiles
    # no faster than the unrolled tower it was meant to mitigate. The
    # persistent compilation cache (utils/platform.py) is the shipped
    # cold-compile mitigation; the scan formulation survives as a test-only
    # option on the SRResNet module (equivalence-tested on CPU).
    # bfloat16 compute keeps the conv towers on the MXU's fast path; params
    # stay float32 and are cast per-op.
    compute_dtype: str = "float32"  # "float32" | "bfloat16"


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    """Fully-conv patch discriminator (reference ``src/models.py:90-120``)."""

    in_channels: int = 3
    num_filters: int = 64
    # Reference parity: 4 stages (needs >= 428px inputs). Fewer stages give a
    # shallower patch critic usable on small images.
    num_stages: int = 4
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data pipeline configuration (reference ``src/variables.py``,
    ``src/transformers.py:73-82``, ``src/train.py:74-95``)."""

    train_dir: str = "data/train"
    val_dir: str = "data/val"
    # HR clip size (height, width); reference: 512x1024 (``variables.py:5-6``).
    hr_size: Tuple[int, int] = (512, 1024)
    upscale_factor: int = 4
    batch_size: int = 12
    # fraction of the train folder actually used (reference's 70/30
    # ``random_split`` with the 30% discarded, ``train.py:82-87``).
    split_ratio: float = 0.7
    split_seed: int = 0
    # Max stddev of the per-image gaussian noise added to LR inputs;
    # severity ~ U(0, max) per image (``transformers.py:76``).
    noise_std_max: float = 0.03
    # Salt & pepper spot corruption of the LR inputs
    # (``transformers.py:39-70``). Default off — the reference defines the
    # transform but never wires it into its train path either.
    salt_prob: float = 0.0
    pepper_prob: float = 0.0
    sp_spot_size: int = 1
    # Per-image random H/V flips of the HR clip before degradation
    # (label-consistent pairs, device-side, ~free). An augmentation the
    # reference lacks — off by default to match its pipeline exactly;
    # training pipelines honor it, validation never augments.
    augment_flips: bool = False
    prefetch_depth: int = 2
    num_workers: int = 4
    drop_remainder: bool = True
    # Device-resident dataset cache: decode once, upload the whole dataset
    # to HBM as uint8, and assemble every batch with an on-device gather —
    # zero host->device bytes per step. "auto" enables it when the dataset
    # fits the budget. Essential when the host link is slow (the dev
    # tunnel moves ~20 MB/s; a float32 512x1024 batch would cost ~3.6 s).
    device_cache: str = "auto"  # "auto" | "on" | "off"
    device_cache_budget_bytes: int = 4 << 30


@dataclasses.dataclass(frozen=True)
class PoolConfig:
    """Multi-generator competitive pool (the README spec, ``readme.md:1-17``).

    The reference describes the algorithm in prose with free parameters;
    these knobs pin them explicitly (SURVEY.md §7 hard part (b)).
    """

    num_generators: int = 1
    # Loss threshold splitting the two GAN-probability regimes
    # ("Starting_GAN_loss", ``readme.md:10``). The README leaves the value
    # free; r3's flagship ablation measured running losses bottoming out at
    # 0.05-0.07, so the former hand default of 0.05 kept every member in
    # the above-regime forever and the leader-mostly-GAN dynamic never
    # engaged (VERDICT r3 weak #2). None (the default) = AUTO-CALIBRATE:
    # after the first completed epoch the threshold is pinned to
    # ``gate_auto_frac * median(running_loss)`` — between the epoch-1 loss
    # level and the converged level, so members cross INTO the below-regime
    # as they improve, with no hand tuning. A float pins it explicitly
    # (the reference knob). On ``--resume`` an auto threshold is
    # re-calibrated at the first post-resume epoch end from the restored
    # running losses (it is not checkpointed).
    starting_gan_loss: Optional[float] = None
    # Auto-calibration fraction of the epoch-1 median running loss (only
    # read while ``starting_gan_loss`` is None).
    gate_auto_frac: float = 0.6
    # P(GAN update) while a generator's running loss is above the threshold
    # ("大概率使用对比损失，小概率使用GAN").
    p_gan_above: float = 0.1
    # P(GAN update) for the best generator once below the threshold
    # ("第一个模型大概率使用GAN").
    p_gan_leader: float = 0.9
    # P(GAN update) for a non-leader whose loss exceeds the current minimum.
    p_gan_follower: float = 0.1
    # EMA factor for the per-generator running contrastive loss that drives
    # the ordering and the regime decision ("比较自身对比损失和pre_loss").
    loss_ema: float = 0.9
    # Weak-learns-from-strong interpolation: param = a*strong + (1-a)*weak
    # (reference ``src/utils.py:113-115``, alpha=0.2).
    mutual_alpha: float = 0.2
    mutual_learning: bool = True
    # README orders the pool by loss ascending (``readme.md:4``); the helper
    # the reference ships sorts descending (``utils.py:107``). We follow the
    # README (deviation recorded in SURVEY.md §7(5)).
    sort_ascending: bool = True
    # Execute the pool as ONE vmapped train state with a leading pool axis
    # (one fused step updates all members — the TPU-idiomatic layout,
    # SURVEY.md §2 EP row) instead of sequential per-member steps.
    stacked: bool = True
    # How the stacked step executes the members. "scan" (default):
    # ``lax.scan`` over the pool axis with each member's grad+Adam inside
    # its own iteration — 1x activation memory (no remat), one compiled
    # body (faster compiles), and the fused Pallas loss kernel engages (it
    # can't batch under the member vmap). "vmap": all members in one
    # interleaved differentiated region — maximum scheduler freedom at
    # small shapes, but N x activations live at the backward; at flagship
    # shapes the 3-member programs need ``--remat`` + batch 12 on v5e and
    # fail to compile at batch 24, where scan runs 28.6 img/s (GAN) /
    # 36.1 (pixel) vs vmap's 15-17 (GAN, b12+remat). Same update semantics
    # either way (parity-tested).
    member_exec: str = "scan"  # "scan" | "vmap"
    # Which generator the shared discriminator trains against each batch.
    # "leader" (default): the current best member's SR — the README names
    # member 0 "the main information generator" (readme.md:7) and mostly
    # routes GAN updates to it once converged, so D specializes against the
    # distribution the adversarial gradients actually flow to; followers
    # read the same D, which is exactly the README's leader-centric
    # competitive dynamic. "round_robin": cycle D's fake batch through all
    # members so it sees the whole pool's output distribution (same cost —
    # still one D step per batch).
    d_train_target: str = "leader"  # "leader" | "round_robin"
    # pre_loss-relative modulation of P(GAN) (``readme.md:5``: each model
    # "compares its own contrastive loss with pre_loss to decide the
    # probability of using GAN"). When on, a member whose running loss
    # IMPROVED since the last epoch-end snapshot (loss < pre_loss) scales
    # its P(GAN) by ``pre_loss_boost`` — pixel progress secured, spend
    # batches on adversarial texture; a member that REGRESSED
    # (loss >= pre_loss) scales by ``pre_loss_damp`` — fall back toward
    # pixel updates. Off (default), pre_loss is telemetry only and the
    # gate reads the EMA loss alone — the interpretation that the EMA
    # already encodes the own-vs-recent-past comparison the README asks
    # for. Both readings are documented at the gate sites.
    pre_loss_gate: bool = False
    pre_loss_boost: float = 1.5
    pre_loss_damp: float = 0.5


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. The reference's only strategy is data parallelism
    over NCCL DDP (``src/train.py:31,45,47``); here it is a 1-D ``data`` mesh
    with XLA collectives over ICI/DCN."""

    data_axis: str = "data"
    num_devices: Optional[int] = None  # None = all visible devices


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration (reference ``src/train.py:23-71``)."""

    num_epochs: int = 30
    lr_generator: float = 1e-4
    # reference: lr_discriminator = lr_generator / 2 (``train.py:41``)
    lr_discriminator: float = 5e-5
    # Schedule: "linear" is the reference's active LinearLR 1→0.01
    # (``train.py:70-71``); "cosine" is its defined-but-commented
    # CosineAnnealingLR variant (``train.py:64,68-69``).
    lr_schedule: str = "linear"
    lr_start_factor: float = 1.0
    lr_end_factor: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    # Fine-tune phase: reloading a checkpoint divides LRs by this and renames
    # the run prefix to "Post-Training" (``train.py:51-59``, readme.md:14).
    finetune_lr_divisor: float = 5.0
    # GAN loss terms (relativistic, tanh-squashed; ``train.py:190,218``).
    use_gan: bool = False
    # VGG19 perceptual loss weight (0 = off, the reference's shipped state:
    # it builds the extractor but comments the loss out of the loop,
    # ``train.py:49,157``; loss at ``utils.py:154-166``). When > 0 the
    # weighted feature-L1 term joins every generator objective. Pretrained
    # torchvision weights are ported if a local cache exists
    # (``models/vgg.py``); otherwise the extractor runs with its random
    # init (still a valid fixed-feature prior).
    perceptual_weight: float = 0.0
    # Feature taps for the perceptual loss (``train.py:49``).
    vgg_layers: Tuple[str, ...] = ("conv3_3", "conv4_3")
    # Torch-free pretrained VGG19 weights (.npz from
    # ``vgg.export_torch_vgg19_to_npz``). None → try the torchvision cache,
    # else fall back to random features WITH a runtime warning
    # (``models/vgg.py:init_vgg_extractor``).
    vgg_weights_npz: Optional[str] = None
    # TRAINED contrastive-encoder feature prior (.npz from
    # ``scripts/train_encoder.py``) — the reference's planned image-encoder
    # objective (``src/utils.py:118-137``), realized. When set (and
    # ``perceptual_weight > 0``) it replaces the VGG extractor as the
    # perceptual feature source; unlike VGG it is trainable entirely
    # in-image (no pretrained download needed).
    perceptual_encoder_npz: Optional[str] = None
    # Polyak/EMA averaging of the generator weights (0 = off, the
    # reference's behavior — it serves the raw last-step weights). When
    # > 0 every generator update also advances an EMA shadow
    # (``ema ← d·ema + (1−d)·params``, fused into the train-step
    # executable); validation, keep-best and checkpointed serving read the
    # shadow. A TPU-cheap extension that smooths the noisy GAN endpoint
    # (measured: PARITY.md quality section). Pick the decay for the run
    # length: the averaging horizon is ~1/(1−d) steps (0.99 ≈ 100 steps).
    ema_decay: float = 0.0
    # Visual-comparison grids every N epochs (``train.py:233-260``);
    # 0 (or negative) disables them, matching checkpoint_every's 0=off.
    validate_every: int = 5
    score_max_batches: int = 30  # compute_score cap (``train.py:271-272``)
    # In-epoch live progress line (the reference's per-batch tqdm postfix,
    # ``train.py:145,166``), fed from the lagged metric drain so it costs
    # no extra host sync: "auto" = only when stderr is a TTY, "always",
    # "off".
    progress: str = "auto"
    results_dir: str = "results"
    run_prefix: str = "Training"
    seed: int = 0
    # opt-in NaN debugging, replacing the reference's always-on
    # ``set_detect_anomaly(True)`` (``train.py:177,207``; SURVEY.md §5).
    debug_nans: bool = False
    # Multi-host metric aggregation: all-reduce (mean) the scalar epoch
    # metrics across hosts before logging, instead of the reference's
    # one-curve-per-rank files (``train.py:123-137``). Default off = per-host
    # parity.
    reduce_metrics: bool = False
    # Multi-process runs agree on batch-boundary preemption stops via a
    # cross-host OR every N batches (Trainer._should_stop) — per-batch
    # host-side collectives would serialize the lagged dispatch pipeline,
    # while the stop decision must still be collective (a host-local break
    # would deadlock the other hosts' collective steps). Single-process
    # runs check the local flag every batch and ignore this knob.
    stop_sync_every_batches: int = 8
    # Preemption-safe periodic checkpointing: snapshot the full state every
    # N epochs (0 = end-of-run only, the reference's behavior,
    # ``train.py:123-125``). ``Trainer.train(resume=True)`` continues the
    # same run from the last snapshot's epoch.
    checkpoint_every: int = 0
    # Track the best validation PSNR: every time the epoch score improves,
    # snapshot to "<run_prefix>-best" (async, overlapped with training).
    # The reference keeps only the final weights; long GAN fine-tunes can
    # end below their peak, so this preserves the peak. Off by default =
    # reference parity.
    keep_best: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    discriminator: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    pool: PoolConfig = dataclasses.field(default_factory=PoolConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def small_test_config() -> Config:
    """Tiny config mirroring BASELINE config 1: single generator,
    pixel-loss-only 2x SR on 64x64→128x128 crops."""

    return Config(
        model=ModelConfig(num_features=16, num_residuals=2, upscale_factor=2),
        data=DataConfig(hr_size=(128, 128), upscale_factor=2, batch_size=2),
        train=TrainConfig(num_epochs=2, validate_every=1),
    )
