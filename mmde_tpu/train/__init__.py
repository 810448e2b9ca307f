"""Training: optimizer construction, LR schedules, train/eval steps, loops."""
