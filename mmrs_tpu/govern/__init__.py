from mmrs_tpu.govern import hashing, dedup, normalize, manifest, vqa  # noqa: F401
