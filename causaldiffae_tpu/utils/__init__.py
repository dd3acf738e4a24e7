"""Utilities: logging, torch checkpoint porting, rng helpers."""
