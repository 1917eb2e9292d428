"""Configuration for the UC-NeRF TPU framework.

Typed dataclasses replacing the reference's gin + absl flags stack
(``/root/reference/nerf/internal/configs.py:22-189``).  A small
``Config.field = value`` binding parser keeps the reference's CLI ergonomics
(``--gin_bindings="Config.near = 0."``) without the gin dependency.

Defaults follow the reference's ``Config`` dataclass; the ``waymo()`` factory
applies ``configs/waymo.gin`` + ``scripts/train_waymo.sh`` bindings (near 0,
far 8, batch 15000, 2 levels, 128 prop + 32 nerf samples, brightness
correction + sky model on).
"""

from __future__ import annotations

import ast
import dataclasses
from typing import Any, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """One field MLP (hash encoder + density/color nets).

    Mirrors the gin-configurable attributes of the reference ``MLP``
    (models.py:367-403).
    """
    # Hash grid (models.py:396-401).
    grid_num_levels: int = 10  # Derived: log(desired/base)/log(interval) + 1.
    grid_level_interval: int = 2
    grid_level_dim: int = 4
    grid_base_resolution: int = 16
    grid_desired_resolution: int = 8192
    grid_log2_hashmap_size: int = 21
    grid_init_std: float = 1e-4
    # Nets.
    bottleneck_width: int = 256
    net_depth_viewdirs: int = 2
    net_width_viewdirs: int = 256
    skip_layer_dir: int = 0
    num_rgb_channels: int = 3
    deg_view: int = 4
    bottleneck_noise: float = 0.0
    density_bias: float = -1.0
    density_noise: float = 0.0
    rgb_premultiplier: float = 1.0
    rgb_bias: float = 0.0
    rgb_padding: float = 0.001
    disable_density_normals: bool = True
    enable_pred_normals: bool = False
    disable_rgb: bool = False
    warp_fn: Optional[str] = "contract"
    scale_featurization: bool = False
    # TPU-efficiency knob: query the hash grid once per sample at the hex
    # mean (modulated by the mean erf weight) instead of per hex point — 6x
    # fewer table lookups; the reference encodes all 6 points.
    hex_single_query: bool = False
    # Cast the hash table to bfloat16 for the gather: TPU gathers read a
    # full 128-lane tile per index, so this halves the dominant HBM traffic.
    # Features round to bf16 (~0.4% rel); table GRADIENTS stay exact f32.
    grid_bf16_gather: bool = False
    # Round-5 backward-sort reductions (ops/hashgrid._gather_wsum_ml).
    # dense_sample: sort dense (non-hashed) levels at SAMPLE granularity
    # (1/8 the stream; precision unchanged up to bf16 frac rounding).
    # value_dtype='bfloat16': pack hashed-level grad payloads as bf16 pairs
    # (3-array sorts instead of 5-array; one bf16 rounding per update —
    # the reference's half-precision backward rounds harder, fp16 atomics).
    grid_bwd_dense_sample: bool = False
    grid_bwd_value_dtype: Optional[str] = None
    # Matmul precision for the field's dense layers: None (float32) or
    # 'bfloat16' (MXU bf16 with f32 accumulation; params stay f32).
    compute_dtype: Optional[str] = None
    # Let gradients flow through the contraction warp (documented deviation:
    # the reference wraps it in no-grad, coord.py:75, which makes ray-origin
    # translation unlearnable during camera refinement).  Set via
    # Config.contract_origin_grads, which rewrites both MLP configs.
    contract_grads: bool = False
    num_glo_features: int = 0
    num_glo_embeddings: int = 1000
    net_width_glo: int = 128
    net_depth_glo: int = 2

    def with_grid(self, desired_resolution: int) -> "MLPConfig":
        """Derive the per-proposal-level grid config (models.py:425-426)."""
        import numpy as np
        n = int(np.log(desired_resolution / self.grid_base_resolution)
                / np.log(self.grid_level_interval)) + 1
        return dataclasses.replace(
            self, grid_desired_resolution=desired_resolution,
            grid_num_levels=n)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """The proposal-hierarchy model (reference ``Model``, models.py:31-55)."""
    num_prop_samples: int = 64
    num_nerf_samples: int = 32
    num_levels: int = 3  # N-1 proposal levels + 1 nerf level.
    bg_intensity_range: Tuple[float, float] = (1.0, 1.0)
    anneal_slope: float = 10.0
    stop_level_grad: bool = True
    use_viewdirs: bool = True
    raydist_fn: Optional[str] = None
    single_jitter: bool = True
    dilation_multiplier: float = 0.5
    dilation_bias: float = 0.0025
    near_anneal_rate: Optional[float] = None
    near_anneal_init: float = 0.95
    resample_padding: float = 0.0
    opaque_background: bool = False
    power_lambda: float = -1.5
    std_scale: float = 0.5
    prop_desired_grid_size: Tuple[int, ...] = (512, 2048)
    # Sky model (models.py:84-92): vanilla NeRF D=8 W=256, view posenc deg 4.
    sky_net_depth: int = 8
    sky_net_width: int = 256
    sky_deg_view: int = 4
    sky_num_samples: int = 120
    sky_far_mult: float = 1.5
    # Brightness correction (extrinsic_optimizer.py:4-48).
    brightness_latent_dim: int = 4
    brightness_net_depth: int = 3
    brightness_net_width: int = 256


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level config (reference configs.py:22-174, trimmed to live fields)."""
    # Data.
    dataset_loader: str = "synthetic"
    data_dir: Optional[str] = None
    depth_dir: Optional[str] = None
    refine_name: Optional[str] = None  # pose.json override path.
    exp_name: str = "test"
    batch_size: int = 2**16
    patch_size: int = 1
    factor: int = 4
    render_chunk_size: int = 65536
    near: float = 2.0
    far: float = 6.0
    cam_type: int = 6  # 6 -> 3 front cameras on Waymo.
    llffhold: int = 8  # Every Nth frame group is test.
    training_views: int = 210
    # Synthetic-dataset render size (tests / quality baselines without
    # Waymo data on disk).
    synthetic_height: int = 64
    synthetic_width: int = 96
    load_sky_segments: bool = True
    virtual_poses: bool = False
    randomized: bool = True
    # In-graph per-physical-camera se(3) refinement (north-star config 4:
    # the reference's poses are frozen numpy; here residual miscalibration
    # is optimized jointly with the field — see models/cam_refine.py).
    optimize_cameras: bool = False
    num_phys_cams: int = 3
    # LR multiplier for the se(3) camera deltas relative to the field LR
    # (pose parameters diverge under the field's 0.01 Adam rate).
    cam_lr_mult: float = 0.02
    # Open the contraction warp's gradients (documented deviation from the
    # reference's no-grad track_linearize, coord.py:75): photometric
    # gradients then reach ray origins, making the TRANSLATION half of the
    # se(3) camera deltas learnable (QUALITY_r03/r04).  Default off =
    # reference parity.
    contract_origin_grads: bool = False
    # Model toggles.
    model_sky: bool = False
    brightness_correction: bool = False
    gradient_scaling: bool = False
    zero_glo: bool = False
    # Train.
    max_steps: int = 25000
    checkpoint_every: int = 5000
    resume_from_checkpoint: bool = True
    checkpoints_total_limit: int = 1
    print_every: int = 100
    train_render_every: int = 500
    # Losses.
    data_loss_type: str = "charb"
    charb_padding: float = 0.001
    data_loss_mult: float = 1.0
    data_coarse_loss_mult: float = 0.0
    interlevel_loss_mult: float = 0.0
    anti_interlevel_loss_mult: float = 0.01
    pulse_width: Tuple[float, ...] = (0.03, 0.003)
    distortion_loss_mult: float = 0.005
    opacity_loss_mult: float = 0.0
    orientation_loss_mult: float = 0.0
    orientation_coarse_loss_mult: float = 0.0
    orientation_loss_target: str = "normals_pred"
    predicted_normal_loss_mult: float = 0.0
    predicted_normal_coarse_loss_mult: float = 0.0
    hash_decay_mults: float = 0.1
    sky_weight: float = 0.002
    idt_weight: float = 0.002
    # Optimizer (configs.py:95-103).
    lr_init: float = 0.01
    lr_final: float = 0.001
    lr_delay_steps: int = 5000
    lr_delay_mult: float = 1e-8
    adam_beta1: float = 0.9
    adam_beta2: float = 0.99
    adam_eps: float = 1e-15
    grad_max_norm: float = 0.0
    grad_max_val: float = 0.0
    # Eval.
    eval_only_once: bool = True
    eval_save_output: bool = True
    eval_quantize_metrics: bool = True
    eval_crop_borders: int = 0
    vis_num_rays: int = 16
    # Render.
    render_path_frames: int = 120
    render_video_fps: int = 60
    # Path generator (data/paths.py; camera_utils.py:133-350):
    # keyframe | spiral | ellipse | spline.
    render_path_type: str = "keyframe"
    render_path_z_variation: float = 0.0  # ellipse height variation
    render_path_z_phase: float = 0.0      # ellipse height phase
    render_spline_keyframes: int = 10     # spline: # keyframes from dataset
    # Reference-style keyframe selection (configs.py:154 / camera_utils
    # create_render_spline_path): a directory of images or a text file of
    # image names; when set, overrides the stride-based keyframe pick.
    render_spline_keyframes_file: Optional[str] = None
    render_spline_degree: int = 5
    render_spline_smoothness: float = 0.03
    # Nested model/MLP configs.
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    nerf_mlp: MLPConfig = dataclasses.field(default_factory=MLPConfig)
    prop_mlp: MLPConfig = dataclasses.field(
        default_factory=lambda: MLPConfig(disable_rgb=True,
                                          disable_density_normals=True))
    # Parallelism / memory.
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> all devices, 1D.
    donate_train_state: bool = True
    remat_fields: bool = True  # jax.checkpoint around the field MLPs.
    # Gradient-accumulation microbatches inside the jitted train step.  All
    # loss terms are ray-means (+ param-only regularizers), so accumulating
    # microbatch gradients is EXACTLY the full-batch gradient; the lax.scan
    # body is compiled once and reused, bounding both XLA program size and
    # activation memory.
    microbatches: int = 1
    # Drive microbatches from host (one short device program each) instead of
    # one fused lax.scan — for environments with per-program runtime limits.
    host_microbatches: bool = False
    # In-graph sub-chunking of the eval/render step: lax.map over
    # render_subchunks slices of each render chunk, bounding the forward's
    # activation peak at (chunk/sub) scale while keeping ONE dispatch.  The
    # reference renders chunk 15000 sharded across multi-GPU hosts
    # (models.py:943); the 6-point-hex forward at that chunk needs ~23 GB of
    # activations on a single 16 GB chip — the scan makes the canonical
    # chunk single-chip feasible.
    render_subchunks: int = 1


def waymo(**overrides) -> Config:
    """The canonical Waymo config (configs/waymo.gin + train_waymo.sh)."""
    base = Config(
        dataset_loader="waymov2",
        near=0.0,
        far=8.0,
        # The reference's WaymoV2 loader ignores Config.factor and always
        # trains at the native 1920x1280 (datasets.py:896-917); factor=1
        # keeps the canonical preset metric-comparable.  Pass factor=4 for
        # the 480x320 memory-bounded variant.
        factor=1,
        adam_eps=1e-8,
        batch_size=15000,
        render_chunk_size=15000,
        max_steps=30000,
        cam_type=6,
        brightness_correction=True,
        model_sky=True,
        virtual_poses=False,
        # Single-chip note: the EXACT-hex step at 10 microbatches sits
        # 46 MB over a v5e's 15.75 GB HBM — run the exact path with
        # microbatches=15 on one chip (gradient-identical: every loss is a
        # ray-mean; bench.py does this — measured 9% faster than the
        # first-fitting m=12, PERF_NOTES round 4).  The flagship
        # single-query preset fits at 10 and is fastest at 15 (waymo_tpu).
        microbatches=10,
        model=ModelConfig(num_levels=2, num_prop_samples=128,
                          num_nerf_samples=32),
        # Round-5 backward: dense-prefix levels sort at SAMPLE granularity
        # (1/8 the stream; precision unchanged up to bf16 frac rounding).
        # Measured: flagship 10089 -> 12013 rays/s, exact 1589 -> 2073
        # (BENCH/PERF_NOTES round 5).
        nerf_mlp=MLPConfig(disable_density_normals=True,
                           grid_bwd_dense_sample=True),
        prop_mlp=MLPConfig(disable_rgb=True, disable_density_normals=True,
                           grid_bwd_dense_sample=True),
    )
    return dataclasses.replace(base, **overrides)


def waymo_tpu(**overrides) -> Config:
    """The TPU-optimized flagship: canonical Waymo architecture (same model
    capacity, sampling counts, grid sizes, losses) with the TPU-efficiency
    knobs on — single-query hex encoding (6x fewer table lookups) and
    in-graph lax.scan gradient accumulation (ONE fused device program per
    step).  The scan was 6% slower than host-driven microbatches before the
    round-4 per-level gather change and 2.7% FASTER after it (9929-9931 vs
    9671 rays/s, measured twice; PERF_NOTES round 4) — with the gathers
    cheaper, removing the per-microbatch dispatch wins.

    microbatches=15, not 10: swept empirically on the v5e at the canonical
    batch of 15000 (PERF_NOTES round 4): m=5 9639, m=6 9494, m=8 9889,
    m=10 9917-9929, m=12 9519, m=15 10080-10083 (x3 runs), m=20 9748,
    m=30 9506 rays/s.  m=15's 1000-ray microbatch makes the prop lookup
    streams 1.024M — 2.4% below 2^20, the least pow2-padding of any
    divisor's stream — but padding alone does not order the whole sweep
    (m=8 pads 4.2% and lands below m=10's 30%), so the default is the
    measured optimum, not a closed-form rule.  batch_size must stay
    divisible by microbatches (the reshape errors loudly if not)."""
    base = waymo(
        microbatches=15,
        host_microbatches=False,
        nerf_mlp=MLPConfig(disable_density_normals=True,
                           hex_single_query=True,
                           grid_bwd_dense_sample=True),
        prop_mlp=MLPConfig(disable_rgb=True, disable_density_normals=True,
                           hex_single_query=True,
                           grid_bwd_dense_sample=True),
    )
    return dataclasses.replace(base, **overrides)


def synthetic_quality(**overrides) -> Config:
    """Quality-gate config: the CANONICAL Waymo model architecture (same
    grids, sampling counts, losses, optimizer as ``waymo()``) trained on the
    procedural synthetic scene.  No Waymo data ships in this image, so this
    is the reproducible PSNR benchmark; QUALITY_r*.md records the results.
    Flip hex_single_query via -b 'NerfMLP.hex_single_query = True' to
    measure the TPU fast-encoding's quality delta."""
    base = waymo(
        dataset_loader="synthetic",
        near=0.2,
        far=12.0,
        training_views=36,
        synthetic_height=128,
        synthetic_width=192,
        batch_size=4096,
        render_chunk_size=4096,
        max_steps=1500,
        lr_delay_steps=300,
        checkpoint_every=1500,
        train_render_every=500,
        # Canonical encoding (10 levels, 2^21 hashmap, hex multisampling)
        # and MLP widths; proposal sample count halved (128 -> 64) to keep
        # the recorded runs tractable on one tunneled chip.
        model=ModelConfig(num_levels=2, num_prop_samples=64,
                          num_nerf_samples=32),
        # One monolithic program at canonical-architecture sizes crashes the
        # TPU backend compiler (regalloc RET_CHECK in lsrav2; observed on
        # v5e) after ~14 min; host-driven 2048-ray microbatch programs
        # compile and run fine and are gradient-identical.
        microbatches=2,
        host_microbatches=True,
    )
    return dataclasses.replace(base, **overrides)


def tiny(**overrides) -> Config:
    """CPU-runnable smoke config: tiny grids, few samples, small batches."""
    base = Config(
        dataset_loader="synthetic",
        near=0.0,
        far=8.0,
        batch_size=256,
        render_chunk_size=512,
        max_steps=50,
        adam_eps=1e-8,
        lr_delay_steps=5,
        training_views=6,
        brightness_correction=True,
        model_sky=True,
        model=ModelConfig(num_levels=2, num_prop_samples=16,
                          num_nerf_samples=8,
                          prop_desired_grid_size=(64,),
                          sky_num_samples=16, sky_net_depth=2,
                          sky_net_width=32, brightness_net_width=32),
        nerf_mlp=MLPConfig(grid_desired_resolution=128, grid_num_levels=4,
                           grid_log2_hashmap_size=12, bottleneck_width=32,
                           net_width_viewdirs=32,
                           disable_density_normals=True),
        prop_mlp=MLPConfig(grid_desired_resolution=64, grid_num_levels=3,
                           grid_log2_hashmap_size=10, disable_rgb=True,
                           disable_density_normals=True),
    )
    return dataclasses.replace(base, **overrides)


_PRESETS = {"waymo": waymo, "waymo_tpu": waymo_tpu, "tiny": tiny,
            "synthetic_quality": synthetic_quality, "default": Config}


def parse_bindings(config: Config, bindings: Sequence[str]) -> Config:
    """Apply 'Config.field = value' / 'Model.field = value' style overrides.

    Mirrors the reference's --gin_bindings CLI (train_waymo.sh:4-14).  Scopes:
    Config, Model, NerfMLP, PropMLP.
    """
    cfg = config
    for b in bindings:
        lhs, rhs = b.split("=", 1)
        scope, _, field = lhs.strip().partition(".")
        value = ast.literal_eval(rhs.strip())
        if scope == "Config":
            cfg = dataclasses.replace(cfg, **{field: value})
        elif scope == "Model":
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, **{field: value}))
        elif scope == "NerfMLP":
            cfg = dataclasses.replace(
                cfg,
                nerf_mlp=dataclasses.replace(cfg.nerf_mlp, **{field: value}))
        elif scope == "PropMLP":
            cfg = dataclasses.replace(
                cfg,
                prop_mlp=dataclasses.replace(cfg.prop_mlp, **{field: value}))
        else:
            raise ValueError(f"Unknown binding scope: {scope!r} in {b!r}")
    return cfg


def load_config(preset: str = "default",
                bindings: Sequence[str] = ()) -> Config:
    """Build a config from a preset name plus bindings."""
    factory = _PRESETS[preset]
    cfg = factory() if callable(factory) else factory
    return parse_bindings(cfg, bindings)
