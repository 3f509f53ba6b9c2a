from mmrs_tpu.index.gallery import GalleryIndex, build_index  # noqa: F401
