from mmrs_tpu.eval.zeroshot import multiclass_zeroshot, binary_zeroshot  # noqa: F401
from mmrs_tpu.eval.sweep import pair_threshold_sweep, write_sweep_csv  # noqa: F401
