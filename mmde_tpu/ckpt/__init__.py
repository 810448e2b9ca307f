"""Checkpointing: orbax save/resume/best + PyTorch weight converters."""
