"""Helpers to load the read-only reference implementation for golden tests.

The reference (PyTorch) is executed — never copied — to produce golden
outputs that the TPU-native implementation must match numerically.
"""
import sys
import warnings

REFERENCE_ROOT = "/root/reference"


def get_reference():
    warnings.filterwarnings("ignore")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import rgbd_segmentation_RAA as raa_mod
    from deeplab.residual_net import Bottleneck

    return raa_mod, Bottleneck
