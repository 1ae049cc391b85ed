from cosnet_tpu.eval.metrics import compute_iou, f_measure
