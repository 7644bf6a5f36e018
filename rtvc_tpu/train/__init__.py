"""Training: trainers, steps, losses, pruning, checkpoints, GTA, eval."""
