"""Serving layer: HTTP API and web UI."""
