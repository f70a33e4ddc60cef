"""Command-line drivers mirroring the reference's six entry scripts."""
