"""Runtime utilities: metrics, logging, checkpointing, torch-ckpt import."""
