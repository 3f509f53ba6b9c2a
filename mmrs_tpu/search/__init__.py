from mmrs_tpu.search import metrics, calibrate, prototypes  # noqa: F401
