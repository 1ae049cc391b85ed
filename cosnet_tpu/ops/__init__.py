from cosnet_tpu.ops.resize import resize_bilinear
from cosnet_tpu.ops.pooling import max_pool_ceil
