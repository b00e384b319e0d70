"""Engine operators: the zonal kernel, spatial joins, kNN lookup,
dedup/similarity/text pipeline ops, and multimodal plumbing."""
