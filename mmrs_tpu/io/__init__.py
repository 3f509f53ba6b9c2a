from mmrs_tpu.io.images import load_image, has_transparency, ImageLoadResult  # noqa: F401
from mmrs_tpu.io.dataset import scan_folder, FolderDataset, few_shot_sample  # noqa: F401
