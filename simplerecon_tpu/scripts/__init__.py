"""CLI entry points: train, test (depth eval + fusion), pc fusion."""
