"""Sources: JSON corpus readers and the deterministic synthetic clips table
(the BASELINE.json input_hint shape)."""
