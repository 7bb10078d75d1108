"""Cross-run state: resumable output manifests, lineage, fingerprints."""
