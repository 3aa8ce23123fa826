"""Structured Streaming extension.

The reference is batch-only (SURVEY §1.1/§2.9 — zero streaming
operators). This package is the engine's beyond-parity extension: the
staging transform is a pure per-row map, so it lifts directly onto
``readStream``; late events are handled with watermarked windows.
"""
