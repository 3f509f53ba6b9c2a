from mmrs_tpu.models.configs import (  # noqa: F401
    VITConfig,
    TextConfig,
    BertConfig,
    VIT_B32,
    VIT_L14,
    CLIP_TEXT_B32,
    CLIP_TEXT_L14,
    TAIYI_ROBERTA_LARGE,
)
from mmrs_tpu.models import vit, text_transformer, bert, clip, convert  # noqa: F401
