"""Configuration for the swem_tpu framework.

Typed dataclass configs replacing the reference's EasyDict class-attribute
scheme (/root/reference/configs/config.py:5-124). Defaults mirror the
reference's published hyperparameters; all paths are explicit flags with no
hardcoded user directories.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """SWEM network hyperparameters.

    Mirrors /root/reference/configs/config.py:52-62 plus the static-shape
    knobs the TPU design needs (``max_objs`` replaces dynamic object concat).
    """

    model_name: str = "SWEM"
    backbone: str = "resnet50"  # 'resnet50' | 'resnet18'
    keydim: int = 128
    valdim: int = 512
    num_bases: int = 128  # L (train.py:81-82 CLI default; config default 256)
    num_em_iters: int = 4
    em_tau: float = 0.05
    topl: int = 64
    single_object: bool = False
    # Static maximum number of foreground objects (JAX needs static shapes;
    # the reference grows the object axis dynamically, we pad + mask).
    max_objs: int = 2
    mdim: int = 256  # decoder mid channels
    # Compute dtype for conv towers ('float32' for parity, 'bfloat16' for speed).
    dtype: str = "float32"
    # Fused Pallas kernels for the EM inner loop / memory read: True forces
    # them on, False forces the XLA path, None (default, AUTO) resolves per
    # call site via ops/policy.py — currently XLA everywhere, the measured
    # end-to-end conclusion recorded there.
    use_pallas: Optional[bool] = None
    # Gaussian locality reweighting of the memory read (modules.py:210-230;
    # inference-only, off by default in the reference: n_kernel=0)
    n_kernel: int = 0
    kernel_sigma: float = 7.0
    # Random memory-base dropout on the value-read softmax, training only
    # (modules.py:79,258-263; the reference hardcodes 0.0)
    p_drop: float = 0.0

    @property
    def topl_eff(self) -> int:
        return int(min(self.num_bases, self.topl))


@dataclass(frozen=True)
class DataConfig:
    """Dataset/dataloader configuration (/root/reference/configs/config.py:6-49)."""

    seed: int = 123
    num_frames: int = 3  # frames per training clip
    max_num_objs: int = 2
    only_valid: bool = True
    pretrain_sets: Sequence[str] = ("BIG_small", "HRSOD_small", "FSS", "ECSSD", "DUTS")
    pretrain_set_ratio: Sequence[int] = (5, 5, 1, 1, 1)
    maintrain_sets: Sequence[str] = ("DAVIS17", "YTVOS19")
    data_freq: Sequence[int] = (1, 1)
    data_root: str = "datasets"  # root containing DAVIS/, YTVOS19/, STCN_PreTrain/
    vid_load_size: int = 480  # short side at load time -> (480, 864)
    vid_crop_size: Tuple[int, int] = (384, 384)
    davis_max_skip: int = 25
    davis_samples_per_video: int = 5
    ytvos_max_skip: int = 5
    ytvos_samples_per_video: int = 1
    batch_size: int = 8  # global batch (split over data-parallel devices)
    num_workers: int = 8


@dataclass(frozen=True)
class SolverConfig:
    """Optimizer/schedule configuration (/root/reference/configs/config.py:65-75)."""

    stage: int = 0  # 0 pretrain, 1 DAVIS, 2 YTVOS, 3 DAVIS+YTVOS
    base_lr: float = 2e-5
    pretrain_iters: Tuple[int, int] = (150000, 300000)  # (milestone, max_iter)
    maintrain_iters: Tuple[int, int] = (125000, 150000)
    davis_iters: Tuple[int, int] = (50000, 60000)
    gamma: float = 0.1
    optimizer: str = "AdamW"  # 'SGD' | 'Adam' | 'AdamW'
    momentum: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 5e-4
    # activation rematerialization (TPU-native capacity knob; no reference
    # analogue): None | 'encoder' (key trunk, -40..57% peak temp HBM for
    # ~+4% step time) | 'block' (whole frame block; measured strictly worse
    # — see scripts/remat_mem.py). None = fastest, all activations saved.
    remat: Optional[str] = None

    @property
    def stage_name(self) -> str:
        return f"S{self.stage}"

    def stage_iters(self) -> Tuple[int, int]:
        if self.stage == 0:
            return tuple(self.pretrain_iters)
        if self.stage in (1, 2):
            return tuple(self.davis_iters) if self.stage == 1 else tuple(self.maintrain_iters)
        return tuple(self.maintrain_iters)


@dataclass(frozen=True)
class LossConfig:
    """Loss configuration (/root/reference/configs/config.py:78-84)."""

    name: str = "boots_ce"  # 'ce' | 'boots_ce'
    bs_ratio: float = 0.30  # final top-p fraction
    bs_period: Tuple[int, int] = (20000, 70000)  # (start_warm, end_warm)
    aux: Optional[str] = "iou"  # None | 'iou' | 'lovasz'
    aux_ratio: float = 1.0
    only_valid_obj: bool = True


@dataclass(frozen=True)
class EvalConfig:
    """Evaluation configuration (/root/reference/configs/config.py:91-102)."""

    eval_set: str = "DAVIS17"  # DAVIS16|DAVIS17|DAVIS17Test|YTVOS18|YTVOS19
    data_root: str = "datasets"
    output_dir: str = "outputs"
    ssize: int = 480  # short side for inference
    # fixed DAVIS inference size (basic_evaluator.py:160); overridable for
    # small-scale tests
    davis_in_size: Tuple[int, int] = (480, 864)
    chunk: int = 16  # scan chunk length for the DAVIS fast path
    # videos evaluated together per device batch (throughput mode; the
    # reference is strictly sequential B=1)
    video_batch: int = 1
    visualize: bool = False
    max_objs: int = 8  # static object-slot budget at eval time
    flip: bool = False
    scales: Sequence[int] = (480,)
    # shard each video's object slots over this many chips (object
    # parallelism — multi-chip latency for many-object videos; 1 = off).
    # A TPU-native extension; the reference is strictly single-device at
    # eval time. Composes with video_batch (the mesh becomes 2-D).
    obj_parallel: int = 1
    # also write the per-object per-frame J/F series to a CSV next to the
    # global/per-sequence reports (the log rows matching the reference's
    # basic_evaluator.py:311-316 are emitted either way)
    per_object_csv: bool = False


@dataclass(frozen=True)
class SWEMConfig:
    """Top-level experiment config."""

    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    exp_name: str = "swem"
    log_dir: str = "logs"
    log_period: int = 100
    save_period: int = 5000
    vis_period: int = 1000  # overlay image grids to tensorboard (0 = off)
    resume: Optional[str] = None
    from_scratch: bool = True

    def replace(self, **kw) -> "SWEMConfig":
        return dataclasses.replace(self, **kw)


def single_object_config(cfg: SWEMConfig) -> SWEMConfig:
    """MAX_NUM_OBJS==1 flips single-object mode (config.py:123-124)."""
    if cfg.data.max_num_objs == 1:
        return cfg.replace(
            model=dataclasses.replace(cfg.model, single_object=True, max_objs=1)
        )
    return cfg
