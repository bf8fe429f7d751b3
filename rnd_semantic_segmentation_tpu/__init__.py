"""TPU-native semantic-segmentation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the
``taintpro98/rnd-semantic-segmentation`` research stack (reference mounted at
/root/reference): semantic segmentation with unsupervised domain adaptation,
four model families (DeepLabV2-ASPP, GCPA-CC/GALD, PraNet,
Attention-EfficientNet-UNet), three training regimes (source-only supervised,
FADA adversarial domain adaptation, target self-distillation), five dataset
families (GTA5, Cityscapes, SYNTHIA, Kvasir-SEG, BLI), driven by a
YACS-compatible config + CLI-override system.

Design principles (TPU-first, not a port):
  * NHWC layout everywhere on device; conversion happens at the data boundary.
  * All resizes are exact separable interpolation *matmuls* (MXU-friendly and
    bit-compatible with both PyTorch ``align_corners`` flavors).
  * Data parallelism is ``jax.sharding.Mesh`` + jit sharding annotations; BN
    statistics automatically span the global batch (SyncBN for free).
  * Static shapes only inside jit; multi-scale training/TTA use per-scale
    compiled specializations.
  * Hot irregular ops (criss-cross attention) have Pallas TPU kernels with
    pure-jnp references used as parity oracles.
"""

__version__ = "0.1.0"
