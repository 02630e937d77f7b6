"""Serving-side accelerators for the NeRF-as-emitter query path."""
