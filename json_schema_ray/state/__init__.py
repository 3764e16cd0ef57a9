"""Mergeable distributed state: sketches and manifests."""
