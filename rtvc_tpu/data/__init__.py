"""Data layer: preprocessing pipelines, datasets, samplers, duration DP."""
