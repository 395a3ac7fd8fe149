"""Training API: RecModel, optimizers, callbacks, metrics."""
