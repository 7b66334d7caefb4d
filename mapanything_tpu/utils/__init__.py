"""Utilities: inference pipeline, weight conversion, metrics."""
