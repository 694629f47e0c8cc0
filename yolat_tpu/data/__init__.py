"""Data pipeline: synthetic SESYD-style fixtures, preprocessing cache,
proposal generation, packing/bucketing, augmentation."""
