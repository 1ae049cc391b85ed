"""cosnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for unsupervised
RGBD video object segmentation with co-attention siamese networks.

Re-designed from scratch with the capabilities of the reference PyTorch codebase
(yahoo0742/COSNet, see SURVEY.md): the DeepLabv3 ResNet-101+ASPP siamese RGB
encoder, the ResNet+ASPP depth encoder, the channel-wise co-attention block
(affinity matmul with dual row/column softmax and gated attention-summary
fusion — fused into a single flash-style Pallas kernel on TPU), the
`resnet_aspp_add` RGBD fusion model, the SBM-RGBD / HZFU-RGBD data pipelines,
the training loop with two-group poly LR schedule and class-balanced BCE+L1
loss, and the multi-reference-frame inference + soft-IoU evaluation pipeline.

Layout convention: all device-side tensors are NHWC (TPU-native); the CLI /
dataset boundary converts from the reference's NCHW contract.
"""

__version__ = "0.1.0"
