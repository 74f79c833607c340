"""Command-line entry points: training and evaluation drivers."""
