"""Multimodal column handling: binary payloads + typed metadata (north-star)."""
