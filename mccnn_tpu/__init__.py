"""mccnn_tpu — a TPU-native (JAX/XLA/Pallas) stereo-matching framework.

A from-scratch rebuild of the capabilities of MC-CNN-python (the *fast*
architecture of Zbontar & LeCun's "Stereo Matching by Training a Convolutional
Neural Network to Compare Image Patches"): Siamese patch-CNN training and the
full classical matching pipeline (features -> cost volume -> cross-based cost
aggregation -> semi-global matching -> WTA -> left/right consistency
interpolation -> subpixel enhancement -> median/bilateral refinement), with
Middlebury-v3 file contracts at the edges.

Where the reference runs per-pixel Python loops on the host
(reference: src/process_functional.py), every stage here is a jit-compiled
XLA/Pallas program over device-resident `(H, W, D)` arrays, shardable over a
`jax.sharding.Mesh` (data-parallel training; disparity-sharded matching).
"""

__version__ = "0.1.0"

from mccnn_tpu.utils.config import MatchConfig, NetConfig, TrainConfig  # noqa: F401
