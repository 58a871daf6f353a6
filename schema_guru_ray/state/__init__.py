"""Run state: per-partition checkpoint manifests with lineage + metrics."""
