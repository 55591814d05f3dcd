"""Run state: lineage manifests, commit protocol, resume."""
