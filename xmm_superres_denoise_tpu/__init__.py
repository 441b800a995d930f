"""TPU-native XMM-Newton super-resolution / denoising framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
SamSweere/xmm-superres-denoise (reference mounted read-only at
/root/reference): astronomy preprocessing, dataset machinery, a model zoo
(RRDB CNNs + restoration transformers), on-device metrics/losses, and a
shard_map data-parallel training/inference harness.
"""

__version__ = "0.1.0"
