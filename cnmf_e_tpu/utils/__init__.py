"""Simulation, metrics, and logging utilities."""
