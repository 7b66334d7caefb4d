"""Data layer: host-side image loading, resolution buckets, synthetic batches."""
