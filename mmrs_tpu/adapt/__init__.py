from mmrs_tpu.adapt import contrastive  # noqa: F401
