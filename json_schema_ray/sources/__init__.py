"""Sources: readers and deterministic synthetic generators."""
