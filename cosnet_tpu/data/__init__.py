from cosnet_tpu.data.sbm_rgbd import SbmRgbdDataset
from cosnet_tpu.data.hzfu_rgbd import HzfuRgbdDataset
from cosnet_tpu.data.pipeline import BatchLoader, device_prefetch
