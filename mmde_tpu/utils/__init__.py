"""Logging, meters, visualization."""
