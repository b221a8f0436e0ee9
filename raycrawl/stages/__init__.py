"""Ray Data stage functions (stateless map_batches bodies + actor classes)."""
