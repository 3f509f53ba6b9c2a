from mmrs_tpu.utils.stats import StageStats, StageTimer  # noqa: F401
from mmrs_tpu.utils.logging import get_logger  # noqa: F401
