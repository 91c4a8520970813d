"""Engine state: union-find, checkpoint manifests, lineage metadata."""
