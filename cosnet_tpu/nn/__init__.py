from cosnet_tpu.nn.resnet import BasicBlock, Bottleneck, ResNet
from cosnet_tpu.nn.aspp import ASPP
from cosnet_tpu.nn.encoders import Encoder, DepthEncoderResNetASPP, DepthEncoderResNet
from cosnet_tpu.nn.raa import RGBDSegmentationRAA
