"""Structured Streaming operators and multimodal (Arrow-batched) plumbing."""
