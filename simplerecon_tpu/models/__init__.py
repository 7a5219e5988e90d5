"""Flax module zoo: encoders, decoders, and the full depth model."""
