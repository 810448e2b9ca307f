"""flax.linen neural building blocks (TPU-first implementations)."""
