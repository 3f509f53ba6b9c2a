from mmrs_tpu.ops.normalize import l2_normalize  # noqa: F401
