"""Pydantic config schema for the TPU-native framework.

Mirrors the reference's validated config tree
(`/root/reference/xmm_superres_denoise/config/config.py:24-237`) — dataset
(sim/real/boring with lr/hr sub-configs), model (discriminated union on
`base_model`), trainer, loss weights with the sum-in-(0,1] rule — and adds a
TPU-specific `MeshCfg` section (device mesh axes for data/fsdp parallelism)
replacing the reference's Lightning accelerator/strategy knobs.
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path
from typing import List, Literal, Optional, Tuple, Union

from pydantic import (
    BaseModel,
    Field,
    NonNegativeFloat,
    NonNegativeInt,
    PositiveInt,
    field_validator,
    model_validator,
)


class ConfigError(Exception):
    pass


class DatasetType(str, Enum):
    SIM = "sim"
    REAL = "real"
    BORING = "boring"


class ImageType(str, Enum):
    IMG = "img"
    AGN = "agn"
    BKG = "bkg"


class BaseModels(str, Enum):
    ESR_GEN = "esr_gen"
    RRDB_DENOISE = "rrdb_denoise"
    SWINIR = "swinir"  # extra vs reference enum; SwinIR ships in its model zoo
    SWINFIR = "swinfir"
    DRCT = "drct"
    HAT = "hat"
    RESTORMER = "restormer"


def _empty_to_none(value):
    if value == "" or value is None:
        return None
    return Path(value)


def _mask_exists(v):
    """Shared det_mask existence check (reference config.py:57-74)."""
    if v is not None:
        if not v.exists():
            raise FileNotFoundError(f"Detector mask does not exist at '{v}'!")
        if v.is_dir():
            raise FileExistsError(f"Detector mask path is a directory: '{v}'")
    return v


class HrDatasetCfg(BaseModel):
    det_mask: Optional[Path] = None
    agn: bool = True
    exp: NonNegativeInt
    clamp_max: NonNegativeFloat
    res: PositiveInt

    _norm_mask = field_validator("det_mask", mode="before")(_empty_to_none)
    _check_mask = field_validator("det_mask")(_mask_exists)


class LrDatasetCfg(BaseModel):
    bkg: Union[bool, NonNegativeInt] = 1
    det_mask: Optional[Path] = None
    exps: List[PositiveInt]
    clamp_max: NonNegativeFloat
    res: PositiveInt

    _norm_mask = field_validator("det_mask", mode="before")(_empty_to_none)
    _check_mask = field_validator("det_mask")(_mask_exists)


class DatasetCfg(BaseModel):
    agn: Union[bool, NonNegativeInt] = 1
    batch_size: PositiveInt = 1
    check_files: bool = False
    debug: bool = False
    comb_hr: bool = False
    crop_mode: Literal["center", "random", "boresight"] = "center"
    directory: Path = Path("")
    mode: Literal["img", "agn"] = "img"
    name: str = "sim_dataset"
    scaling: Literal["linear", "sqrt", "asinh", "log"] = "sqrt"
    type: DatasetType = DatasetType.SIM
    # synthetic fake-backend size; the reference hardcodes 10000
    # (dataset.py:63) — configurable here so CLI smoke runs stay small
    boring_size: PositiveInt = 10000
    lr: LrDatasetCfg
    hr: Optional[HrDatasetCfg] = None

    @property
    def res_mult(self) -> int:
        if self.type is DatasetType.REAL or self.hr is None:
            return 1  # no HR side (denoise-style / input-only datasets)
        return self.hr.res // self.lr.res

    def _mode_dir(self, mode: ImageType) -> Path:
        if self.type is DatasetType.SIM:
            d = self.directory / self.name / mode.value
            if mode is ImageType.BKG and not d.exists():
                # the shipped example data names this directory "background"
                alt = self.directory / self.name / "background"
                if alt.exists():
                    return alt
            return d
        if mode is ImageType.IMG and self.type is DatasetType.REAL:
            return self.directory / self.name
        raise ConfigError(
            f"No {mode.value.upper()} directory for dataset type '{self.type.value}'"
        )

    @property
    def img_dir(self) -> Path:
        return self._mode_dir(ImageType.IMG)

    @property
    def agn_dir(self) -> Path:
        return self._mode_dir(ImageType.AGN)

    @property
    def bkg_dir(self) -> Path:
        return self._mode_dir(ImageType.BKG)


class OptimizerCfg(BaseModel):
    learning_rate: NonNegativeFloat
    betas: Tuple[NonNegativeFloat, NonNegativeFloat] = (0.9, 0.999)


class RrdbCfg(BaseModel):
    base_model: Literal["esr_gen", "rrdb_denoise"]
    in_channels: PositiveInt = 1
    out_channels: PositiveInt = 1
    filters: PositiveInt = 32
    residual_blocks: PositiveInt = 4


class TransformerCfg(BaseModel):
    base_model: Literal["swinir", "swinfir", "drct", "hat"]
    patch_size: PositiveInt = 1
    img_size: PositiveInt = 416
    window_size: PositiveInt = 16
    embed_dim: PositiveInt = 180
    upsampler: Literal["pixelshuffle", "pixelshuffledirect", "nearest+conv", ""] = (
        "pixelshuffle"
    )
    in_channels: PositiveInt = 1
    num_heads: List[PositiveInt]
    depths: List[PositiveInt]


class RestormerCfg(BaseModel):
    base_model: Literal["restormer"]
    in_channels: PositiveInt = 1
    out_channels: PositiveInt = 1
    dim: PositiveInt = 24


class ModelCfg(BaseModel):
    name: BaseModels
    memory_efficient: bool = False
    batch_size: PositiveInt = 1
    # Train through the space-to-depth fast path (RRDB models only): every
    # fwd/bwd conv runs on full 128-lane MXU tiles with the weight transform
    # in-graph — exact same math/grads as the plain apply
    # (ops/s2d_forward.make_s2d_train_apply).
    s2d_train: bool = False
    # Scan-compress the transformer group stacks (DRCT/HAT): one traced
    # group body lax.scan'ed over stacked per-group params — collapses the
    # production train graph ~6x so it fits runtime compile-size caps.
    # Exact same math (tests/test_scan_layers.py); checkpoints convert via
    # models.scan_stack.
    scan_layers: bool = False
    model: Union[RrdbCfg, TransformerCfg, RestormerCfg] = Field(
        ..., discriminator="base_model"
    )
    optimizer: OptimizerCfg


class MeshCfg(BaseModel):
    """Device-mesh topology — the TPU-native replacement for the reference's
    Lightning `accelerator`/`strategy`/`devices` (config.py:206-219).

    data  : data-parallel axis size ("auto" = all local devices)
    fsdp  : parameter-sharding axis size (1 = replicated params, i.e. plain DP)
    """

    data: Union[PositiveInt, Literal["auto"]] = "auto"
    fsdp: PositiveInt = 1
    # Activation rematerialization: forces `memory_efficient` on the model
    # (the reference FSDPStrategy's activation_checkpointing_policy,
    # train.py:142-146) — applied in cli.load_run_config.
    remat: bool = False


class TrainerCfg(BaseModel):
    accelerator: Literal["auto", "cpu", "tpu"] = "auto"
    mesh: MeshCfg = MeshCfg()
    checkpoint_path: Optional[Path] = None
    checkpoint_root: Optional[Path] = None
    epochs: PositiveInt = 50
    log_images_every_n_epochs: NonNegativeInt = 0
    seed: int = 0
    # Training compute precision: "bf16" runs the model forward/backward in
    # bfloat16 with f32 master params/loss/optimizer (TPU mixed precision —
    # the MXU's 2x-rate mode; no loss scaling needed). Lightning-style
    # spellings ("32", 32, "bf16-mixed") are normalized by the validator.
    precision: Literal["f32", "bf16"] = "f32"
    # Lightning's accumulate_grad_batches: k loader batches per optimizer
    # step, exactly equivalent to one k-times-larger batch (weighted-mean
    # loss algebra; train/steps.py:make_accum_steps) at the memory cost of
    # one extra gradient pytree.
    accumulate_grad_batches: PositiveInt = 1
    # Lightning's EarlyStopping callback as trainer knobs: stop when
    # val/loss (the checkpoint monitor, reference train.py:133-139) has
    # not improved by more than min_delta for `patience` consecutive
    # epochs. 0 disables (reference behavior: fixed-epoch runs).
    early_stopping_patience: NonNegativeInt = 0
    early_stopping_min_delta: float = Field(0.0, ge=0)
    # Lightning's gradient_clip_val (global-norm algorithm, its default):
    # clip the global gradient norm before the Adam update. 0 disables
    # (the reference never sets it — default reproduces its behavior).
    gradient_clip_val: float = Field(0.0, ge=0)
    # Legacy reference keys accepted for config compatibility (train.py:141-155).
    # `strategy="fsdp"` is honored: it defaults the mesh to a 2-way fsdp axis
    # when the mesh section didn't already shard params (see validator).
    strategy: Literal["auto", "ddp", "fsdp"] = "auto"
    devices: Union[PositiveInt, Literal["auto"]] = "auto"

    @field_validator("precision", mode="before")
    @classmethod
    def _norm_precision(cls, v):
        return {
            "32": "f32", 32: "f32", "32-true": "f32", "fp32": "f32",
            "bf16-mixed": "bf16", "bf16-true": "bf16",
        }.get(v, v)

    @model_validator(mode="after")
    def _honor_legacy_strategy(self):
        if self.strategy == "fsdp" and self.mesh.fsdp == 1:
            self.mesh.fsdp = 2
        return self

    _norm_ckpt = field_validator("checkpoint_path", "checkpoint_root", mode="before")(
        _empty_to_none
    )


class LossCfg(BaseModel):
    l1: float = Field(0.0, ge=0, le=1)
    poisson: float = Field(0.0, ge=0, le=1)
    psnr: float = Field(0.0, ge=0, le=1)
    ssim: float = Field(0.0, ge=0, le=1)
    ms_ssim: float = Field(0.0, ge=0, le=1)

    @model_validator(mode="after")
    def check_sum(self):
        s = self.l1 + self.poisson + self.psnr + self.ssim + self.ms_ssim
        if 0 < s <= 1:
            return self
        raise ConfigError(
            f"Sum of relative percentages has to be between 0 and 1, got {s}!"
        )
