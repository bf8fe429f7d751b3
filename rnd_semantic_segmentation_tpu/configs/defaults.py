"""Default config tree.

Mirrors the reference's option surface (/root/reference/core/configs/defaults.py:5-91)
and adds TPU-native knobs under MODEL.DTYPE / DIST / DATA_PIPE that have no
reference counterpart (the reference's runtime knobs were CUDA-specific).
"""

from .node import CfgNode

_C = CfgNode()

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------
_C.MODEL = CfgNode()
# "<family>_<backbone>" dispatch string, e.g. "deeplab_resnet101", "gald_hardnet68",
# "pranet_res2net50", "attn_efficientnet-b2" (reference core/models/build.py:5-53
# only factory-dispatched deeplab; here every family goes through one registry).
_C.MODEL.NAME = "deeplab_resnet101"
_C.MODEL.NUM_CLASSES = 2
_C.MODEL.DEVICE = "tpu"                  # "tpu" | "cpu" (reference used "cuda")
_C.MODEL.WEIGHTS = ""                     # pretrained backbone weights (.pth/.npz path or URL)
_C.MODEL.FREEZE_BN = False                # fold BN to frozen affine on the backbone
# TPU-native: compute dtype for the forward/backward pass ("bfloat16"|"float32").
# Params and optimizer state stay float32; logits are always float32.
_C.MODEL.DTYPE = "bfloat16"
# TPU-native: convs whose channel widths are all <= this execute via the
# space-to-depth lowering (ops/s2d.py — 2x2 spatial packed into channels for
# ~4x better MXU tile occupancy on narrow convs; exact numerics).  0 = off.
# Relevant for pranet (Res2Net 26-208w branches, 32w RFB) and the attn UNet
# decoder (8-120w); set from measurement, not by default.
_C.MODEL.S2D_MAX_CHANNELS = 0
# TPU-native: execute ConvTranspose2d via sub-pixel phase decomposition
# (ops/subpixel.py) instead of lhs_dilation — exact numerics, 1/stride² of
# the dilated lowering's MACs (the attn decoder's 5 upsamplers are 49% of
# that family's forward FLOPs as dilated).  Off until chip-measured.
_C.MODEL.SUBPIXEL_DECONV = False
# TPU-native: fuse the MBConv expand->BN->swish->depthwise->BN->swish segment
# into one VMEM-resident Pallas pass on the eval path (ops/mbconv.py) — the
# EfficientNet encoder is HBM-bandwidth-bound and this removes the expanded
# (6x) tensor's HBM round trip.  Eval/serving only; train keeps XLA ops.
_C.MODEL.FUSED_MBCONV = False
# Block-granular rematerialization inside every backbone (EfficientNet
# MBConv, ResNet/Res2Net residual units, HarDNet blocks): each block
# recomputes in the backward, only block boundaries stay resident.  THIS
# is the knob that lowers peak HBM — measured attn@512 b64: temp 14.3 GB
# -> 7.9 GB for a 12% step-time cost (PROBE_REMAT.json); whole-loss
# SOLVER.REMAT does not.  Exact numerics; identical param tree, so
# checkpoints are interchangeable.
_C.MODEL.REMAT_BLOCKS = False

# ---------------------------------------------------------------------------
# Input / preprocessing
# ---------------------------------------------------------------------------
_C.INPUT = CfgNode()
_C.INPUT.TRAINSIZE = 352                  # square train size (PraNet pipelines)
_C.INPUT.SOURCE_INPUT_SIZE_TRAIN = (1280, 720)   # (W, H), reference convention
_C.INPUT.TARGET_INPUT_SIZE_TRAIN = (1024, 512)
_C.INPUT.INPUT_SIZE_TEST = (1024, 512)
_C.INPUT.INPUT_SCALES_TRAIN = (1.0, 1.0)
_C.INPUT.IGNORE_LABEL = 255
_C.INPUT.PIXEL_MEAN = [0.485, 0.456, 0.406]
_C.INPUT.PIXEL_STD = [0.229, 0.224, 0.225]
_C.INPUT.TO_BGR255 = False
_C.INPUT.BRIGHTNESS = 0.0
_C.INPUT.CONTRAST = 0.0
_C.INPUT.SATURATION = 0.0
_C.INPUT.HUE = 0.0
_C.INPUT.HORIZONTAL_FLIP_PROB_TRAIN = 0.0

# ---------------------------------------------------------------------------
# Augmentation pipeline selector (reference core/components/augment.py:26-33)
# ---------------------------------------------------------------------------
_C.AUG = CfgNode()
_C.AUG.NAME = "attn"                      # attn | pra | aspp | none
_C.AUG.BLUR_PROB = 0.7
_C.AUG.ROTATE_PROB = 0.7
_C.AUG.JITTER_PROB = 0.7
_C.AUG.FLIP_PROB = 0.7
_C.AUG.PROB = 0.7
_C.AUG.COLLATE = "attn"                   # attn | pranet | None

# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------
_C.DATASETS = CfgNode()
_C.DATASETS.DATASET_DIR = ""
_C.DATASETS.SOURCE_TRAIN = ""
_C.DATASETS.TARGET_TRAIN = ""
_C.DATASETS.VALIDATION = ""
_C.DATASETS.TEST = ""
_C.DATASETS.CROSS_VAL = 0
# images per split of the synthetic stand-in datasets (tests/benchmarks)
_C.DATASETS.SYNTHETIC_LENGTH = 64

# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------
_C.SOLVER = CfgNode()
_C.SOLVER.EPOCHS = 5
_C.SOLVER.MAX_ITER = 16000
_C.SOLVER.STOP_ITER = 10000
_C.SOLVER.LR_METHOD = "poly"
_C.SOLVER.BASE_LR = 0.02
_C.SOLVER.BASE_LR_D = 0.008
_C.SOLVER.LR_POWER = 0.9
_C.SOLVER.MOMENTUM = 0.9
_C.SOLVER.WEIGHT_DECAY = 0.0005
_C.SOLVER.WEIGHT_DECAY_BIAS = 0.0
_C.SOLVER.DECAY_RATE = 0.1
_C.SOLVER.DECAY_EPOCH = 50
_C.SOLVER.GAMMA = 0.1
_C.SOLVER.CHECKPOINT_PERIOD = 5
_C.SOLVER.KEEP_CHECKPOINTS = 0            # prune to last N (0 = keep all)
# Overlap checkpoint disk serialization with training (Orbax async save);
# the device->host snapshot is still taken synchronously at the save step.
_C.SOLVER.ASYNC_CHECKPOINT = False
# Global batch size; split across the data-parallel mesh axis
# (reference core/configs/defaults.py:74-77 documents the same global semantics).
_C.SOLVER.BATCH_SIZE = 8
_C.SOLVER.BATCH_SIZE_VAL = 1
# TPU-recipe knobs (configs/*_tpu.yaml).  The chip plateaus of the reference
# batch sizes differ per family (BENCH_BATCH_SCALE.json: attn climbs 2.29x
# to b128, the others are flat) — recipes raise BATCH_SIZE and declare the
# reference batch here so the LR follows the linear scaling rule
# (lr *= BATCH_SIZE/LR_BATCH_REF) instead of silently training at the small-
# batch LR.  0 disables (reference recipe fidelity).
_C.SOLVER.LR_BATCH_REF = 0
# iteration-granular linear warmup multiplier min(1, (it+1)/WARMUP_ITERS)
# applied on top of whatever schedule the family dispatches — large-batch
# recipes need the ramp (the per-epoch warmups in warmup_cosine are too
# coarse when an epoch is a handful of steps).  0 disables.
_C.SOLVER.WARMUP_ITERS = 0
_C.SOLVER.GRAD_CLIP = 0.0                 # per-element clamp, 0 disables
                                          # (reference core/utils/utils.py:6-16)
# FADA generator adversarial weight λ (reference hardcodes 0.001,
# aspp_fada.py:110-112; tunable for short-horizon adaptation runs)
_C.SOLVER.ADV_WEIGHT = 0.001
# TPU-native: microbatch gradient accumulation inside the jitted step
# (effective batch = BATCH_SIZE, HBM footprint = BATCH_SIZE/ACCUM_STEPS)
_C.SOLVER.ACCUM_STEPS = 1
# TPU-native: whole-loss activation rematerialization (train/steps.py
# remat_wrap).  none | full (jax.checkpoint, nothing saveable) | dots
# (conv/matmul results saveable).  Measured caveat (PROBE_REMAT.json,
# attn@512 b64): a SINGLE remat block keeps the recomputed forward live
# through the backward sweep, so peak HBM does NOT drop (14.3 -> 15.3 GB)
# — for real memory relief use block-granular MODEL.REMAT_BLOCKS
# (14.3 -> 7.9 GB there).  These modes stay for exactness experiments and
# as the wrap point for future segmented policies.
_C.SOLVER.REMAT = "none"
# After training, re-estimate BN running stats over N loader batches
# (torch swa_utils.update_bn analog, train/bn_recal.py) and re-save the
# final checkpoint.  Short from-scratch runs need this: the EfficientNet
# encoder's BN momentum is 0.01, so running stats lag batch stats by
# hundreds of steps and eval-mode quality collapses.  0 disables.
_C.SOLVER.BN_RECAL_BATCHES = 0

# ---------------------------------------------------------------------------
# Test
# ---------------------------------------------------------------------------
_C.TEST = CfgNode()
_C.TEST.BATCH_SIZE = 1
_C.TEST.FLIP_TTA = False
_C.TEST.MULTI_SCALE = False
_C.TEST.SCALES = (0.7, 1.0, 1.3)
# TPU-native serving: post-training int8 quantization (serve/quant.py).
# "none" | "int8" (s8xs8->s32 convs on the MXU) | "fake" (f32 oracle path)
# | "auto" (int8 only where the measured policy says it wins: geometry below
#   QUANT_MAX_AREA and calibration argmax agreement >= QUANT_AGREEMENT_FLOOR)
_C.TEST.QUANT = "none"
_C.TEST.QUANT_CALIB_BATCHES = 2           # eval batches used for calibration
# "auto" geometry gate: above this H*W the model is HBM- not MXU-bound and
# int8 measured 0.64x bf16 (gald@1024x2048, BENCH_SERVING.json) — serve bf16
_C.TEST.QUANT_MAX_AREA = 1048576          # 0 disables the geometry gate
# fall back to bf16 when quant-vs-f32 argmax agreement on the calibration
# batch drops below this (gald@512 measured 0.920 — a real accuracy loss)
_C.TEST.QUANT_AGREEMENT_FLOOR = 0.95
# int8 only where the MXU pays: convs with in/out channels below this stay
# bf16; odd widths are zero-padded to the int8 tile boundary in-kernel
# (v5e microbench in serve/quant.py QuantConfig.min_channels/pad_channels)
_C.TEST.QUANT_MIN_CHANNELS = 64
# when TEST.QUANT=auto misses the agreement floor, greedily exclude up to
# this many worst-quantizing convs (per-layer sensitivity repair,
# serve/quant.py repair_exclusions) before falling back to bf16.  0 disables.
_C.TEST.QUANT_REPAIR_MAX = 6

# ---------------------------------------------------------------------------
# Distribution / mesh (TPU-native; no reference counterpart — replaces
# torch.distributed/NCCL from train_adv.py:84-88)
# ---------------------------------------------------------------------------
_C.DIST = CfgNode()
_C.DIST.DATA_AXIS = "data"                # mesh axis name for batch sharding
_C.DIST.SPATIAL_AXIS = "spatial"          # mesh axis name for H sharding
_C.DIST.SPATIAL_PARALLEL = 1              # devices along the spatial axis
_C.DIST.NUM_DEVICES = 0                   # cap mesh device count (0 = all)
_C.DIST.INITIALIZE = False                # call jax.distributed.initialize()

# ---------------------------------------------------------------------------
# Host data pipeline (replaces DataLoader workers, train_src.py:16-25)
# ---------------------------------------------------------------------------
_C.DATA_PIPE = CfgNode()
_C.DATA_PIPE.NUM_WORKERS = 4
# >0: decode/augment/collate in forked worker PROCESSES (torch num_workers
# semantics) instead of the thread pool — threads can't parallelize the
# pure-Python/PIL per-item residue (GIL; BENCH_HOST.json thread scaling is
# flat), processes can.  Same batches/order; augmentation RNG decorrelates
# per worker and is not reproducible across worker counts (as in torch).
_C.DATA_PIPE.WORKER_PROCESSES = 0
_C.DATA_PIPE.PREFETCH = 2                 # device-buffer prefetch depth
_C.DATA_PIPE.SEED = 0
# TPU-native: run the per-pixel augment math on device (data/device_pipe.py)
# instead of in the host Augmenter.  Dispatches on AUG.NAME: "pra"/"attn"
# get their family pipelines (rot90/flip/jitter; blur/rotate/jitter/flip),
# anything else the aspp-style resize/flip/jitter/normalize.  The host
# Augmenter automatically reduces to its variable-shape residue (crop) for
# train mode when this is on — no manual AUG.NAME pairing needed.
_C.DATA_PIPE.DEVICE_AUG = False
# native C++ decode path (native/segdata.cpp) for the loader fast path
_C.DATA_PIPE.NATIVE_DECODE = False

# ---------------------------------------------------------------------------
# Self-distillation (TPU-native online mode: teacher forward in-graph)
# ---------------------------------------------------------------------------
_C.DISTILL = CfgNode()
_C.DISTILL.ONLINE = False                 # teacher in the same XLA graph
_C.DISTILL.TEACHER = ""                   # teacher checkpoint (orbax dir/.pth)
_C.DISTILL.CONFIDENCE_THRESHOLD = 0.0     # pseudo-label confidence gate

# ---------------------------------------------------------------------------
# Debug / sanitizers (replaces torch.autograd.set_detect_anomaly,
# train_distill.py:63)
# ---------------------------------------------------------------------------
_C.DEBUG = CfgNode()
_C.DEBUG.NANS = False                     # jax_debug_nans
_C.DEBUG.CHECKIFY = False                 # reserved: checkify index checks

_C.OUTPUT_DIR = "."
_C.resume = ""
_C.PSEUDO_DIR = ""
_C.SEED = 0


def get_default_cfg() -> CfgNode:
    return _C.clone()
