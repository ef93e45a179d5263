"""Multimodal column handling: opaque binary payloads + typed metadata."""
