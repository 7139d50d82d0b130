"""Utilities: host-side pose math, metrics, evaluation."""
