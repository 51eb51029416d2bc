"""map_batches stage functions and actor classes (Ray-side)."""
