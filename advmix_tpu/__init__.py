"""advmix_tpu — TPU-native robust human-pose-estimation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
AIprogrammer/AdvMix (CVPR 2021, "When Human Pose Estimation Meets
Robustness"): top-down 2D pose estimation (SimpleBaseline-ResNet, HRNet,
plus bottom-up HigherHRNet), AdvMix adversarial-mixing training (UNet
generator + knowledge-distillation teacher fused in one compiled step),
corruption-robustness benchmarking (mPC / rPC over 15 corruption types x 5
severities), all designed TPU-first: NHWC layouts, jit + shard_map over a
device mesh, on-device batched data transforms, and Pallas kernels for the
hot non-matmul ops.
"""

__version__ = "0.1.0"
