"""TPU compute primitives: log-mel frontend, rotary embeddings, pooling,
attention, resampling. All ops are shape-static and jit-friendly."""
