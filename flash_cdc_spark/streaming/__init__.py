"""Streaming layer: webhook sink, pipeline control plane, windowed ops."""
