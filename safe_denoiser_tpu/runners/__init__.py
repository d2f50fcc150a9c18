"""Task runners (L3): the reference's run_*.py CLI surface on the TPU core."""
