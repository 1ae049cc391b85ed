from cosnet_tpu.train.losses import weighted_bce_loss, l1_loss, segmentation_pair_loss
from cosnet_tpu.train.optim import GroupedSGD, lr_poly
